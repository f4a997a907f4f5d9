"""Process-level distributed helpers.

The reference wraps torch.distributed with rank/world helpers and a
pickle-based object all_gather (reference distributed/distributed.py:1-143).
In JAX the host side only needs process identity — all tensor collectives
live inside compiled programs (psum / automatic sharding) — so this module
is deliberately thin. Metric aggregation is numeric `psum` inside the train
step; no pickle path exists because none is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_compilation_cache(path: str = "~/.cache/faceoff_tpu_xla") -> None:
    """Persist XLA compilations across process restarts (first compile of
    the fused train step is minutes; subsequent runs hit the cache).

    TPU-only: XLA:CPU persists AOT machine code whose target features can
    mismatch across hosts (SIGILL risk), so the cache stays off for CPU
    runs."""
    import os

    try:
        if jax.default_backend() != "tpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(path)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - version-dependent flags
        print(f"compilation cache unavailable: {e}")


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (no-op on a single host).

    Mirrors the role of dist.launch + init_process_group (reference
    distributed/launch.py:52-92) for multi-host TPU pods.

    MUST run before anything touches the XLA backend — even
    `jax.process_count()` initializes it, which is why this does NOT
    probe the process count first (doing so silently broke real
    multi-process init; caught by tests/test_multiprocess.py). With no
    kwargs it relies on jax's cluster auto-detection (TPU pod metadata /
    coordinator env vars) and degrades to a no-op on a single host.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if kwargs or "must be called before" in str(e):
            # explicit coordinator config — or a caller that touched the
            # backend first (an ordering bug) — must not fail silently
            raise
        print(f"single-process run (distributed init skipped: {e})")


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/samples
    (reference distributed/distributed.py:25-27)."""
    return jax.process_index() == 0


def all_reduce_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Mean over a mesh axis — usable inside shard_map'd code."""
    return jax.lax.pmean(x, axis_name)


def synchronize(name: str = "faceoff_sync") -> None:
    """Cross-process barrier (reference distributed/distributed.py:42-52:
    dist.barrier() when world_size > 1).

    Blocks until every process in the jax.distributed runtime reaches the
    same named point, via a psum over all global devices
    (multihost_utils.sync_global_devices). Single-process runs only drain
    the local dispatch queue — the same degradation as the reference's
    world_size==1 early return."""
    if jax.process_count() <= 1:
        jax.block_until_ready(
            jax.device_put(jnp.zeros(()), jax.devices()[0]) + 0
        )
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
