"""Device-mesh construction and sharding helpers.

Replaces the reference's process-per-GPU NCCL launcher
(reference distributed/launch.py:22-92) with a `jax.sharding.Mesh`: a single
process drives all local chips; data parallelism is a sharded leading batch
axis under `jax.jit`, and XLA lowers the gradient/codebook-statistics
reductions onto ICI automatically. Multi-host runs use
`jax.distributed.initialize()` (see faceoff_tpu.parallel.collectives).

Mesh axes:
  data — shards clips (the reference's only strategy, DDP);
  time — optional frame-axis (sequence) sharding for long clips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    time: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'time') mesh. data=-1 uses every available device."""
    devs = list(devices) if devices is not None else jax.devices()
    if data == -1:
        if len(devs) % time != 0:
            raise ValueError(f"{len(devs)} devices not divisible by time={time}")
        data = len(devs) // time
    n = data * time
    if n > len(devs):
        raise ValueError(f"mesh {data}x{time} needs {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(data, time)
    return Mesh(arr, ("data", "time"))


def batch_sharding(mesh: Mesh, time_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for (B, T, ...) arrays: B over 'data', optionally T over 'time'."""
    if time_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (time_axis + 1)
    spec[0] = "data"
    spec[time_axis] = "time"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stage_global(x, sharding: NamedSharding):
    """Place one host array onto a (possibly cross-process) sharding.

    Single process: plain `device_put`. Multi-process: the host value is
    this process's LOCAL shard of the global batch, so the global array
    is assembled with `jax.make_array_from_process_local_data`
    (device_put would demand the identical full value on every process —
    the reference's DDP has the same split: DistributedSampler feeds each
    rank its own slice, distributed/distributed.py:135-143)."""
    if jax.process_count() > 1:
        import numpy as np

        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh):
    """Stage a host batch pytree with the leading axis over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: stage_global(x, sharding), batch
    )
