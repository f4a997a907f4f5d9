#!/usr/bin/env python
"""Design-level multi-chip scaling analysis on a virtual CPU mesh.

Real pods are not available in this environment, so this quantifies the
sharding design the way the compiler sees it: compile the FULL train step
(forward incl. VQ EMA update, losses, backward, Adam) for several
('data', 'time') mesh shapes on a virtual 8-device mesh and report, per
shape, XLA's cost analysis (FLOPs, HBM bytes) and the collective
operations the SPMD partitioner inserted (all-reduces for gradients + VQ
statistics, collective-permutes for the Conv3D temporal halo exchanges),
with their transfer sizes.

The comms/compute ratio is mesh-topology-independent evidence: on real
ICI (v5e: 4x ~400 Gbps links/chip) the reported collective bytes bound
the step's communication time, and the analysis shows it is orders of
magnitude below the compute time — i.e. the design weak-scales.

Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_analysis.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def analyze(data: int, time: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from faceoff_tpu.models import VQVAE
    from faceoff_tpu.parallel import make_mesh
    from faceoff_tpu.train import create_train_state, make_train_step

    n = data * time
    mesh = make_mesh(data=data, time=time, devices=jax.devices()[:n])

    # flagship architecture at a reduced spatial size (the collective
    # STRUCTURE — what gets reduced/permuted and along which axes — is
    # resolution-independent; sizes below scale with the config noted)
    model = VQVAE(in_channels=6, dtype=jnp.float32, use_pallas=False)
    b, t, hw = data, 4 * time, 64
    rng = np.random.default_rng(0)
    batch = {
        "input": jnp.asarray(
            rng.uniform(-1, 1, (b, t, hw, hw, 6)), jnp.float32
        ),
        "gt": jnp.asarray(
            rng.uniform(-1, 1, (b, t, hw, hw, 3)), jnp.float32
        ),
    }
    state = create_train_state(model, jax.random.key(0), batch["input"], lr=1e-3)
    step = make_train_step(model, donate=False)

    batch_sh = NamedSharding(mesh, P("data", "time"))
    repl = NamedSharding(mesh, P())
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sh), batch
    )
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if isinstance(x, jax.Array) else x,
        state,
    )

    lowered = jax.jit(step).lower(state, sharded)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]

    hlo = compiled.as_text()
    colls = {}
    bytes_by_kind = {}
    for m in re.finditer(
        r"(\w[\w.\-]*) = ((?:\([^)]*\)|[^\s(]+)) (all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)\(", hlo
    ):
        shape_s, kind = m.group(2), m.group(3)
        colls[kind] = colls.get(kind, 0) + 1
        total = 0
        for s in re.findall(r"(f32|f16|bf16|s32|u32|pred)\[([\d,]*)\]", shape_s):
            dt, dims = s
            nelem = 1
            if dims:
                for d in dims.split(","):
                    nelem *= int(d)
            width = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                     "pred": 1}[dt]
            total += nelem * width
        bytes_by_kind[kind] = bytes_by_kind.get(kind, 0) + total

    return {
        "mesh": f"{data}x{time} (data x time)",
        "devices": n,
        "global_batch": f"{b} clips x {t} frames @ {hw}px",
        "gflops_per_step_global": round(cost.get("flops", 0.0) / 1e9, 2),
        "hbm_gb_per_step_global": round(
            cost.get("bytes accessed", 0.0) / 1e9, 3
        ),
        "collectives": colls,
        "collective_mb_per_step": {
            k: round(v / 1e6, 3) for k, v in bytes_by_kind.items()
        },
    }


def main():
    import jax

    assert jax.default_backend() == "cpu" and jax.device_count() >= 8, (
        "run under JAX_PLATFORMS=cpu with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    out = []
    for data, time in [(1, 1), (8, 1), (4, 2), (2, 4)]:
        r = analyze(data, time)
        out.append(r)
        print(json.dumps(r), flush=True)
    return out


if __name__ == "__main__":
    main()
