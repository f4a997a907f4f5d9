"""A/B bilinear-warp formulations on TPU at the b16 shape (128 frames, 256px).

1. current: 2-D advanced-index gather (4 taps)
2. flat-take: single flattened take along axis 0
3. onehot-matmul: X one-hot-lerp matmul + Y weighted reduce, tiled by rows
"""
import time, json
import jax, jax.numpy as jnp, numpy as np
from faceoff_tpu.parallel.collectives import enable_compilation_cache
enable_compilation_cache()

N, HW = 128, 256
rng = np.random.default_rng(0)
imgs = jax.device_put(rng.uniform(-1, 1, (N, HW, HW, 3)).astype(np.float32))
ang = jax.device_put((rng.uniform(-3, 3, (N,))).astype(np.float32))

from faceoff_tpu.ops import warp as W

def grids(a):
    M = W.rotation_about(a, jnp.array([HW/2., HW/2.]))
    Mi = W.invert_affine(M)
    x, y = W.identity_grid(HW, HW)
    return Mi[0,0]*x + Mi[0,1]*y + Mi[0,2], Mi[1,0]*x + Mi[1,1]*y + Mi[1,2]

def v_current(imgs, ang):
    def one(img, a):
        xs, ys = grids(a)
        return W.warp_with_grid(img, xs, ys)
    return jax.vmap(one)(imgs, ang)

def v_flat_take(imgs, ang):
    def one(img, a):
        xs, ys = grids(a)
        h, w = HW, HW
        x0, y0 = jnp.floor(xs), jnp.floor(ys)
        dx, dy = (xs-x0)[...,None], (ys-y0)[...,None]
        flat = img.reshape(h*w, 3)
        def tap(xi, yi):
            xc = jnp.clip(xi.astype(jnp.int32), 0, w-1)
            yc = jnp.clip(yi.astype(jnp.int32), 0, h-1)
            v = jnp.take(flat, (yc*w + xc).reshape(-1), axis=0).reshape(h, w, 3)
            ins = ((xi>=0)&(xi<=w-1)&(yi>=0)&(yi<=h-1))[...,None]
            return v*ins
        v00, v01 = tap(x0, y0), tap(x0+1, y0)
        v10, v11 = tap(x0, y0+1), tap(x0+1, y0+1)
        return (v00*(1-dx)+v01*dx)*(1-dy) + (v10*(1-dx)+v11*dx)*dy
    return jax.vmap(one)(imgs, ang)

def v_onehot(imgs, ang):
    def one(img, a):
        xs, ys = grids(a)          # (H, W)
        h, w = HW, HW
        x0, y0 = jnp.floor(xs), jnp.floor(ys)
        dx, dy = xs-x0, ys-y0
        ins = ((xs>=0)&(xs<=w-1)&(ys>=0)&(ys<=h-1)).astype(jnp.float32)
        img_t = img.transpose(1, 0, 2).reshape(w, h*3)   # (w, k*c)
        o = h*w
        xf = x0.reshape(o); dxf = dx.reshape(o)
        yf = jnp.clip(y0.reshape(o).astype(jnp.int32), 0, h-1)
        y1 = jnp.clip(yf+1, 0, h-1)
        dyf = dy.reshape(o)
        wi = jax.lax.broadcasted_iota(jnp.int32, (o, w), 1)
        x0c = jnp.clip(xf.astype(jnp.int32), 0, w-1)
        x1c = jnp.clip(x0c+1, 0, w-1)
        X = ((wi == x0c[:,None]).astype(jnp.float32)*(1-dxf)[:,None]
             + (wi == x1c[:,None]).astype(jnp.float32)*dxf[:,None])
        B = X @ img_t                                   # (o, h*3)
        B = B.reshape(o, h, 3)
        r0 = jnp.take_along_axis(B, yf[:,None,None].repeat(1,1), axis=1)
        # gather 2 rows per output from B — small (o,2,3) gather
        b0 = jnp.take_along_axis(B, jnp.broadcast_to(yf[:,None,None], (o,1,3)), axis=1)[:,0]
        b1 = jnp.take_along_axis(B, jnp.broadcast_to(y1[:,None,None], (o,1,3)), axis=1)[:,0]
        out = b0*(1-dyf)[:,None] + b1*dyf[:,None]
        return (out*ins.reshape(o)[:,None]).reshape(h, w, 3)
    return jax.vmap(one)(imgs, ang)

def timeit(name, fn, iters=10):
    f = jax.jit(fn)
    out = f(imgs, ang)
    np.asarray(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(imgs, ang)
    np.asarray(out.reshape(-1)[0])
    print(json.dumps({"variant": name, "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}), flush=True)
    return out

a = timeit("current_gather", v_current)
b = timeit("flat_take", v_flat_take)
print("flat_take parity:", float(jnp.max(jnp.abs(a-b))), flush=True)
