"""Observability + resilience utilities the reference lacks (SURVEY §5:
"Tracing/profiling: none", "Failure detection: none", "Metrics: print +
tqdm only").

  * MetricsWriter — append-only JSONL scalar log (one line per step) that
    any plotting tool can consume; no tensorboard dependency.
  * StepProfiler — wraps `jax.profiler` to capture a windowed device trace
    (steps [start, start+count)) viewable in XProf/TensorBoard.
  * PreemptionGuard — converts SIGTERM/SIGINT (and SLURM's pre-preemption
    signal, which the reference requests via --signal=B:HUP@600 but never
    catches, bash_scripts/train_videovqvae.sh:11) into a graceful
    "checkpoint at the next step boundary and stop" request.
"""

from __future__ import annotations

import json
import os
import signal
import time
from typing import Dict, Optional


class MetricsWriter:
    """Buffered: `write` enqueues (device scalars stay on device so the
    training loop never syncs); `flush` materializes and appends. A
    per-step float() read would serialize dispatch — see MetricLogger."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        self._buffer = []
        self._warned = set()

    def write(self, step: int, metrics: Dict[str, float], **extra) -> None:
        self._buffer.append((step, time.time(), metrics, extra))

    def flush(self) -> None:
        # start all device->host copies asynchronously first: sequential
        # float() reads over a high-latency link cost one round trip EACH
        for _, _, metrics, _ in self._buffer:
            for v in metrics.values():
                if hasattr(v, "copy_to_host_async"):
                    try:
                        v.copy_to_host_async()
                    except RuntimeError:
                        pass  # deleted buffer: the read below reports it
        for step, t, metrics, extra in self._buffer:
            record = {"step": step, "time": t, **extra}
            for k, v in metrics.items():
                try:
                    record[k] = float(v)
                except (TypeError, ValueError, RuntimeError) as e:
                    # RuntimeError: a buffered device scalar whose buffer
                    # was donated away — keep the record, drop the value,
                    # and say so ONCE per key (silent loss would mask the
                    # exact bug class the lr copy fixed)
                    if k not in self._warned:
                        self._warned.add(k)
                        print(
                            f"metrics: dropping unreadable '{k}' ({e})",
                            flush=True,
                        )
            self._f.write(json.dumps(record) + "\n")
        self._buffer.clear()

    def close(self) -> None:
        self.flush()
        self._f.close()


class StepProfiler:
    """Trace steps [start, start+count) with jax.profiler."""

    def __init__(self, log_dir: Optional[str], start: int = 10, count: int = 5):
        self.log_dir = log_dir
        self.start = start
        self.count = count
        self._active = False

    def step(self, step_idx: int) -> None:
        if self.log_dir is None:
            return
        import jax

        if step_idx == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step_idx >= self.start + self.count:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.log_dir}", flush=True)

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


class PreemptionGuard:
    """Installs handlers for `signals`; `should_stop` turns True after any
    fires. The training loop checks it at step boundaries."""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.should_stop = False
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass  # not main thread / unsupported signal

    def _handler(self, signum, frame):
        print(
            f"received signal {signum}: checkpointing at next step boundary",
            flush=True,
        )
        self.should_stop = True

    def should_stop_global(self) -> bool:
        """Cross-process consensus on stopping. Signals are delivered
        per process; if only a subset saw SIGTERM, a local-flag save
        would enter the all-process orbax barrier alone and deadlock —
        so every process agrees (any-process OR) before saving. Cheap
        no-op on a single process."""
        import jax

        if jax.process_count() <= 1:
            return self.should_stop
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            jnp.asarray([1 if self.should_stop else 0], jnp.int32)
        )
        agreed = bool(np.any(np.asarray(flags)))
        if agreed:
            self.should_stop = True  # propagate to un-signaled processes
        return agreed

    def restore(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass


STALL_EXIT_CODE = 117  # distinctive: wrappers can key auto-resume on it


class StallWatchdog:
    """Fail-fast guard against a hung accelerator client (SURVEY §5:
    the reference has no failure detection at the trainer level).

    Observed failure mode on remote/relay-attached accelerators: the
    client's connection dies mid-run and the next device call blocks
    FOREVER with no exception — the training process looks alive (the
    reconnect loop spins) but makes no progress, and a Python-level
    timeout cannot interrupt the blocked native call. The crash-only
    remedy: a daemon thread watches for step-boundary heartbeats and,
    after `timeout` seconds without one, prints a loud diagnosis and
    hard-exits with STALL_EXIT_CODE so a supervisor (shell loop, SLURM
    requeue, the quality-run orchestrator) restarts the trainer, which
    resumes exactly from the last checkpoint (`--ckpt latest`).

    The timeout must exceed the worst legitimate gap between step
    boundaries — through a remote-compile relay a cold first compile
    takes minutes, so the default is generous (3600 s). `beat()` is
    called by the training loop at every step boundary; `stop()`
    disarms on clean shutdown. `on_stall` is injectable for tests.
    """

    def __init__(
        self,
        timeout: float = 3600.0,
        on_stall=None,
        poll_interval: Optional[float] = None,
    ):
        import threading

        self.timeout = float(timeout)
        self._last_beat = time.monotonic()
        self._stopped = threading.Event()
        self._on_stall = on_stall or self._default_on_stall
        self._poll = poll_interval or min(30.0, max(0.05, self.timeout / 10))
        self._thread = threading.Thread(
            target=self._watch, name="stall-watchdog", daemon=True
        )
        if self.timeout > 0:
            self._thread.start()

    def beat(self) -> None:
        self._last_beat = time.monotonic()

    def stop(self) -> None:
        self._stopped.set()

    def _watch(self) -> None:
        while not self._stopped.wait(self._poll):
            idle = time.monotonic() - self._last_beat
            if idle > self.timeout:
                self._on_stall(idle)
                return

    def _default_on_stall(self, idle: float) -> None:
        print(
            f"STALL: no step heartbeat for {idle:.0f}s "
            f"(> {self.timeout:.0f}s). The accelerator client is likely "
            f"hung on a dead connection; exiting {STALL_EXIT_CODE} so a "
            f"supervisor can restart and resume from the last checkpoint.",
            flush=True,
        )
        os._exit(STALL_EXIT_CODE)
