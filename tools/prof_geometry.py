"""Finer on-TPU timing of prepare_train_batch internals at b16/T8/256px."""
import time, json
import jax, jax.numpy as jnp, numpy as np
from faceoff_tpu.parallel.collectives import enable_compilation_cache
enable_compilation_cache()

B, T, HW = 16, 8, 256
N = B * T
rng = np.random.default_rng(0)
flat_imgs = jax.device_put(rng.uniform(-1, 1, (N, HW, HW, 3)).astype(np.float32))
from faceoff_tpu.data.synthetic import face_landmarks
flat_lms = jax.device_put(np.stack([
    face_landmarks((HW/2, HW/2), HW*0.3).astype(np.float32) for _ in range(N)
]))

from faceoff_tpu.ops import warp as W
from faceoff_tpu.data.device_pipeline import eye_centers_from_landmarks

def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(json.dumps({"piece": name,
                      "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}),
          flush=True)

key = jax.random.key(0)

masks_j = jax.jit(lambda: jax.vmap(lambda p: W.convex_mask(p, HW, HW))(flat_lms[:, 17:67]))
timeit("convex_mask_x128", masks_j)

eyes = eye_centers_from_landmarks(flat_lms)
pert_j = jax.jit(lambda k: W.perturb_clip(k, (flat_imgs+1)*0.5, eyes))
timeit("perturb_clip_x128", pert_j, key)

# the bilinear gather alone (identity-ish rotate grid)
def warp_only(k):
    ang = jax.random.uniform(k, (N,), minval=-3.0, maxval=3.0)
    def one(img, a):
        M = W.rotation_about(a, jnp.array([HW/2., HW/2.]))
        Minv = W.invert_affine(M)
        x, y = W.identity_grid(HW, HW)
        xs = Minv[0,0]*x + Minv[0,1]*y + Minv[0,2]
        ys = Minv[1,0]*x + Minv[1,1]*y + Minv[1,2]
        return W.warp_with_grid(img, xs, ys)
    return jax.vmap(one)(flat_imgs, ang)
timeit("bilinear_warp_x128", jax.jit(warp_only), key)
