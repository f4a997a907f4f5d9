#!/usr/bin/env python
"""VQ kernel microbench: fused Pallas path vs pure-XLA path.

Measures `ops.vq.vq_quantize_train` (assignment + quantize + EMA stats +
EMA update — the full training-mode quantizer, the hot VQ path of
reference models/vqvae_conv3d_latent.py:47-80) standalone, across
codebook sizes, at the flagship activation count.

Rationale: inside the full train step the two paths tie at the flagship
512x64 codebook (BENCHMARKS.md) because XLA fuses the fallback's matmuls
into their neighbours. Standalone, the Pallas kernel's advantage is the
(N, K) score matrix and (N, K) one-hot stats matrix it never writes to
HBM — an advantage that grows linearly with K. This tool quantifies
that crossover so users sizing bigger codebooks know which path to pick.

Usage:  python tools/bench_vq.py [--n 524288] [--dim 64] [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench_one(n: int, dim: int, k: int, use_pallas: bool, iters: int) -> float:
    from faceoff_tpu.ops import vq as vq_ops

    key = jax.random.key(0)
    codebook = vq_ops.init_codebook(key, dim, k)
    x = jax.random.normal(jax.random.key(1), (n, dim), jnp.bfloat16)

    step = jax.jit(
        lambda cb, x: vq_ops.vq_quantize_train(cb, x, use_pallas=use_pallas)
    )
    for _ in range(3):
        quant, idx, diff, codebook = step(codebook, x)
    float(diff)  # device->host read: the only reliable sync on a relay
    t0 = time.perf_counter()
    for _ in range(iters):
        quant, idx, diff, codebook = step(codebook, x)
    float(diff)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3  # ms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288,
                    help="activation rows (default = bottom-level latents "
                         "of a batch-16 x T8 256px step: 16*8*64*64)")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--codebooks", type=int, nargs="+",
                    default=[512, 2048, 8192])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)

    rows = []
    for k in args.codebooks:
        xla_ms = bench_one(args.n, args.dim, k, False, args.iters)
        pl_ms = bench_one(args.n, args.dim, k, True, args.iters)
        rows.append({
            "n": args.n, "dim": args.dim, "n_embed": k,
            "xla_ms": round(xla_ms, 3), "pallas_ms": round(pl_ms, 3),
            "speedup": round(xla_ms / pl_ms, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
