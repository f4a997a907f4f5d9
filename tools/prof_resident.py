"""Time the resident-step pieces on TPU: sampling gather, geometry, step."""
import time, json
import jax, jax.numpy as jnp, numpy as np
from faceoff_tpu.parallel.collectives import enable_compilation_cache
enable_compilation_cache()

B, T, HW, V, F = 16, 8, 256, 16, 16
rng = np.random.default_rng(0)
frames = jax.device_put(rng.integers(0, 256, (V, F, HW, HW, 3), dtype=np.uint8))
from faceoff_tpu.data.synthetic import face_landmarks
lm = np.stack([np.stack([face_landmarks((HW/2, HW/2), HW*0.3).astype(np.float32)
                         for _ in range(F)]) for _ in range(V)])
landmarks = jax.device_put(lm)
n_frames = jax.device_put(jnp.full((V,), F, jnp.int32))

from faceoff_tpu.data.resident import sample_clip_windows
from faceoff_tpu.data.device_pipeline import prepare_train_batch

def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[(0,)*x.ndim]) if hasattr(x, 'ndim') and x.ndim else np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"piece": name, "ms": round(dt, 2)}), flush=True)
    return out

key = jax.random.key(0)

sample_j = jax.jit(lambda k: sample_clip_windows(k, frames, landmarks, n_frames, B, T))
timeit("sample_gather", sample_j, key)

clips, lms = sample_j(key)
prep_j = jax.jit(lambda k: prepare_train_batch(k, clips, lms))
timeit("geometry_only", prep_j, key)

both_j = jax.jit(lambda k: prepare_train_batch(k, *sample_clip_windows(k, frames, landmarks, n_frames, B, T)[:2]))
timeit("sample+geometry", both_j, key)
