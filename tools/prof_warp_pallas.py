import time, json
import jax, jax.numpy as jnp, numpy as np
from faceoff_tpu.parallel.collectives import enable_compilation_cache
enable_compilation_cache()
from faceoff_tpu.ops import warp as W
from faceoff_tpu.ops.warp_pallas import bilinear_warp_frames

N, HW = 128, 256
rng = np.random.default_rng(0)
imgs = jax.device_put(rng.uniform(-1, 1, (N, HW, HW, 3)).astype(np.float32))
ang = jax.device_put(rng.uniform(-3, 3, (N,)).astype(np.float32))

def grids(a):
    M = W.rotation_about(a, jnp.array([HW/2., HW/2.]))
    Mi = W.invert_affine(M)
    x, y = W.identity_grid(HW, HW)
    return Mi[0,0]*x + Mi[0,1]*y + Mi[0,2], Mi[1,0]*x + Mi[1,1]*y + Mi[1,2]

def run(precision, tile_h):
    def f(imgs, ang):
        xs, ys = jax.vmap(grids)(ang)
        return bilinear_warp_frames(imgs, xs, ys, tile_h=tile_h, precision=precision)
    fj = jax.jit(f)
    out = fj(imgs, ang); np.asarray(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fj(imgs, ang)
    np.asarray(out.reshape(-1)[0])
    print(json.dumps({"variant": f"pallas_{precision}_t{tile_h}",
                      "ms": round((time.perf_counter()-t0)/10*1e3, 2)}), flush=True)
    return out

a = run("default", 8)
b = run("bfloat16", 8)
run("default", 4)
run("default", None)
hi = run("highest", 8)
# numeric sanity vs the XLA gather path on device
def cur(imgs, ang):
    def one(img, a):
        xs, ys = grids(a)
        return W.warp_with_grid(img, xs, ys)
    return jax.vmap(one)(imgs, ang)
ref = jax.jit(cur)(imgs, ang)
print("default diff vs gather:", float(jnp.max(jnp.abs(a - ref))),
      "bf16 diff:", float(jnp.max(jnp.abs(b - ref))),
      "highest diff:", float(jnp.max(jnp.abs(hi - ref))), flush=True)
