"""Training orchestrator for the perceptual trainer.

The loop of reference train_faceoff_perceptual.py:84-204 re-built around
jitted steps: per-step metrics come back as device scalars already reduced
over the mesh; validation writes the five mp4 streams the reference does
(source/background/prediction/gt/source_original,
reference train_faceoff_perceptual.py:53-79); checkpoints carry the full
train state at the `validate_at` cadence.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from faceoff_tpu import config as config_lib
from faceoff_tpu.data.dataset import denormalize
from faceoff_tpu.io.checkpoint import CheckpointManager
from faceoff_tpu.io.video import save_frames_as_video
from faceoff_tpu.parallel import is_primary, make_mesh, shard_batch
from faceoff_tpu.train.state import current_lr


def _raw_lr(state):
    """Injected learning rate as a device scalar (no host sync)."""
    try:
        return state.opt_state.hyperparams["learning_rate"]
    except (AttributeError, KeyError, TypeError):
        return float("nan")


class MetricLogger:
    """Running scalar aggregation + console line (replaces the reference's
    tqdm bar + pickle all_gather of mse sums,
    train_faceoff_perceptual.py:113-133).

    LAZY: per-step metrics are kept as device scalars and only read to
    host at log/flush time. A per-step `float()` is a device->host sync
    that serializes dispatch (profiled at ~200 ms/step on a tunneled
    host); deferring it lets steps pipeline."""

    def __init__(self):
        self._pending = []  # (metrics dict of device scalars, frames)
        self.mse_sum = 0.0
        self.mse_n = 0
        self.perceptual = []

    def update(self, metrics: Dict[str, Any], frames: int):
        self._pending.append((metrics, frames))

    def materialize(self):
        """Read all pending device scalars to host. Start every transfer
        asynchronously FIRST: on a high-latency device link, N sequential
        float() reads cost N round trips, while async-then-read costs ~1."""
        for metrics, _ in self._pending:
            for v in metrics.values():
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
        for metrics, frames in self._pending:
            self.mse_sum += float(metrics["mse"]) * frames
            self.mse_n += frames
            if "perceptual" in metrics:
                self.perceptual.append(float(metrics["perceptual"]))
        self._pending.clear()

    @property
    def avg_mse(self) -> float:
        return self.mse_sum / max(self.mse_n, 1)

    def line(self, epoch: int, metrics: Dict[str, Any], lr: float) -> str:
        self.materialize()
        perc = np.mean(self.perceptual) if self.perceptual else 0.0
        return (
            f"epoch: {epoch + 1}; mse: {float(metrics['mse']):.5f}; "
            f"perceptual: {perc:.3f} latent: {float(metrics['latent']):.3f}; "
            f"avg mse: {self.avg_mse:.5f}; lr: {lr:.5f}"
        )


def _local_np(x) -> np.ndarray:
    """Host-read a (possibly cross-process sharded) array: this process's
    addressable block, concatenated in shard order along the batch axis.
    np.asarray on a global array spanning non-addressable devices raises;
    each process reads only the clips it owns. Replica copies (e.g. the
    batch replicated over a 'time' mesh axis) are dropped — only
    replica 0 contributes, and a fully-replicated batch axis
    (index slice(None)) falls back to one shard."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = [
            s for s in x.addressable_shards if s.replica_id == 0
        ] or x.addressable_shards[:1]
        shards = sorted(
            shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def run_validation(
    eval_step,
    state,
    val_loader: Iterable,
    sample_folder: str,
    epoch: int,
    step: int,
    mesh=None,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Write the five validation mp4 streams per batch
    (reference train_faceoff_perceptual.py:53-79) and return mean metrics."""
    from faceoff_tpu.evaluation import evaluate_reconstruction

    os.makedirs(sample_folder, exist_ok=True)
    reports = []
    for i, batch in enumerate(val_loader):
        if max_batches is not None and i >= max_batches:
            break
        extra = {
            k: batch.pop(k) for k in list(batch) if k not in ("input", "gt")
        }
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        out, metrics = eval_step(state, batch)
        rep = evaluate_reconstruction(out, batch["gt"])
        reports.append({k: float(v) for k, v in rep.items()})

        inp = _local_np(batch["input"])
        saves = {
            "source": inp[..., :3],
            "background": inp[..., 3:6],
            "prediction": _local_np(out),
            "source_images": _local_np(batch["gt"]),
        }
        if "source_original" in extra:
            saves["source_original"] = extra["source_original"]
        if "naive" in extra:  # naive blended baseline (dataset naive_blend)
            saves["naive"] = extra["naive"]
        if is_primary():
            for name, clip in saves.items():
                frames = [denormalize(f) for f in clip[0]]
                save_frames_as_video(
                    frames,
                    osp.join(
                        sample_folder, f"{epoch + 1}_{step}_{i}_{name}.mp4"
                    ),
                )
    if not reports:
        return {"val_mse": float("nan")}
    summary = {
        f"val_{k}": float(np.mean([r[k] for r in reports]))
        for k in reports[0]
    }
    if is_primary():
        line = "; ".join(f"{k}: {v:.4f}" for k, v in summary.items())
        print(f"validation: {line}", flush=True)
    return summary


class Trainer:
    """End-to-end perceptual training (reference
    train_faceoff_perceptual.py:147-204 main)."""

    def __init__(
        self,
        cfg: config_lib.Config,
        model,
        state,
        train_step,
        eval_step,
        train_loader,
        val_loader,
        lpips_vars=None,
        mesh=None,
        log_every: int = 10,
        prepare_fn=None,
        metrics_path: Optional[str] = None,
        profile_dir: Optional[str] = None,
        steps_per_call: int = 1,
        stall_timeout: float = 0.0,
    ):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.lpips_vars = lpips_vars
        self.mesh = mesh if mesh is not None else make_mesh()
        self.log_every = log_every
        self.ckpt = CheckpointManager(
            cfg.train.checkpoint_dir, keep=cfg.train.keep_checkpoints
        )
        self.global_step = 0
        self._last_saved_step = -1
        # constant per-run base key (see train_epoch: folded with
        # state.step inside the jitted program)
        self._base_key = jax.random.key(cfg.train.seed * 1_000_003)
        # device-side input pipeline: prepare_fn(key, frames, landmarks)
        # turns a raw uint8 batch into the model batch on-device
        self.prepare_fn = prepare_fn
        # >1: train_step is a make_multi_step scan expecting stacked batches
        self.steps_per_call = steps_per_call

        from faceoff_tpu.train.observability import (
            MetricsWriter,
            PreemptionGuard,
            StallWatchdog,
            StepProfiler,
        )

        self.metrics_writer = (
            MetricsWriter(metrics_path) if metrics_path else None
        )
        self.profiler = StepProfiler(profile_dir)
        self.preemption = PreemptionGuard()
        # fail-fast on a hung accelerator client (0 = disabled): exits
        # STALL_EXIT_CODE after `stall_timeout`s without a step boundary
        # so a supervisor restarts + resumes from the last checkpoint
        self.watchdog = StallWatchdog(stall_timeout)

        # dead-code restart cadence (cfg.train.revive_codes_every; 0 = off):
        # periodically re-seed EMA-dead codebook entries from the current
        # batch's latents (absent in the reference — codebooks there can
        # permanently collapse)
        self.revive_every = getattr(cfg.train, "revive_codes_every", 0)
        self._revive = None
        if self.revive_every:
            @jax.jit
            def revive(state, video, key):
                _, updates = model.apply(
                    {"params": state.params, "vq": state.vq},
                    video, key, method=type(model).revive_codes,
                    mutable=["vq"],
                )
                return updates["vq"]

            self._revive = revive

    def resume(self, step: Optional[int] = None):
        self.state = self.ckpt.restore(self.state, step)
        self.global_step = int(self.state.step)
        print(f"resumed from step {self.global_step}")

    def _batch_stream(self):
        """Yield (host batch or stacked K-batch, n_optimizer_steps)."""
        if self.steps_per_call <= 1:
            for batch in self.train_loader:
                yield batch, 1
            return
        acc = []
        for batch in self.train_loader:
            acc.append(batch)
            if len(acc) == self.steps_per_call:
                stacked = {
                    k: np.stack([b[k] for b in acc]) for k in acc[0]
                }
                yield stacked, self.steps_per_call
                acc = []

    def _device_stream(self):
        """Host batches staged onto the mesh with double-buffering: the
        device_put of batch k+1 overlaps step k (otherwise the transfer
        latency — ~70 ms/step through a tunneled accelerator — serializes
        with every dispatch)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from faceoff_tpu.data.pipeline import prefetch_to_device
        from faceoff_tpu.parallel.mesh import batch_sharding

        if getattr(self.train_loader, "is_resident", False):
            # device-resident corpus: the loader yields the same staged
            # arrays every time — nothing to transfer or double-buffer;
            # the jitted step samples fresh clips from them per step
            for batch in self.train_loader:
                yield batch, self.steps_per_call
            return
        if self.steps_per_call <= 1:
            sharding = batch_sharding(self.mesh)
            for batch in prefetch_to_device(self.train_loader, sharding):
                yield batch, 1
            return
        # stacked (K, B, T, ...): clips shard over 'data' on axis 1
        sharding = NamedSharding(self.mesh, P(None, "data"))
        for batch in prefetch_to_device(
            (b for b, _ in self._batch_stream()), sharding
        ):
            yield batch, self.steps_per_call

    def train_epoch(self, epoch: int):
        logger = MetricLogger()
        t0 = time.time()
        for i, (batch, n_steps) in enumerate(self._device_stream()):
            if getattr(self.train_loader, "is_resident", False):
                # resident batches carry the whole corpus; the trained
                # frame count comes from the loader's sampling config
                frames = (
                    self.train_loader.clips_per_step
                    * self.train_loader.clip_len
                    * n_steps
                )
            elif n_steps > 1:
                first = next(iter(batch.values()))
                frames = int(np.prod(first.shape[:3]))
            else:
                first = next(iter(batch.values()))
                frames = first.shape[0] * first.shape[1]
            # with a device pipeline the raw batch + key go straight into
            # the fused train step (input prep and optimization are one
            # XLA program). The SAME base key is passed every step — the
            # step folds in state.step on device, so per-step key
            # construction costs no extra dispatch on the device link.
            if n_steps > 1:
                base = jax.random.key(
                    self.cfg.train.seed * 1_000_003 + self.global_step
                )
                key = jax.random.split(base, n_steps)
            else:
                key = self._base_key if self.prepare_fn is not None else None
            self.state, metrics = self.train_step(
                self.state, batch, self.lpips_vars, key
            )
            self.global_step += n_steps
            logger.update(metrics, frames)
            self.profiler.step(self.global_step)
            self.watchdog.beat()

            if self.metrics_writer is not None:
                if "lr" in metrics:
                    # the jitted step emits lr as a fresh output buffer —
                    # no extra dispatch, no donated-state alias hazard
                    record = metrics
                else:
                    # custom steps without the lr output: capture from the
                    # state, COPYING (+0) — the raw value is a view into
                    # the train state, whose buffer the next donating step
                    # deletes (caught on hardware)
                    lr = _raw_lr(self.state)
                    if isinstance(lr, jax.Array):
                        lr = lr + 0
                    record = {**metrics, "lr": lr}
                self.metrics_writer.write(
                    self.global_step, record, epoch=epoch,
                )

            if is_primary() and i % self.log_every == 0:
                lr = (
                    float(metrics["lr"]) if "lr" in metrics
                    else current_lr(self.state)
                )
                dt = time.time() - t0
                fps = frames * (i + 1) / max(dt, 1e-9)
                print(
                    logger.line(epoch, metrics, lr)
                    + f"; frames/s: {fps:.1f}",
                    flush=True,
                )
                if self.metrics_writer is not None:
                    self.metrics_writer.flush()

            if (
                self._revive is not None
                and self.global_step % self.revive_every == 0
                and isinstance(batch, dict)
                and "input" in batch
                and n_steps == 1
            ):
                key = jax.random.key(
                    self.cfg.train.seed * 7_368_787 + self.global_step
                )
                new_vq = self._revive(self.state, batch["input"], key)
                self.state = self.state.replace(vq=new_vq)

            if self._stop_requested(i):
                print("preemption requested: saving and stopping", flush=True)
                self._save()
                return logger

            # validation on a global-step cadence (the reference's
            # `i % validate_at == 0` re-validates at the start of every
            # epoch, train_faceoff_perceptual.py:135 — a waste at short
            # epochs)
            if self.global_step % self.cfg.train.validate_at == 0:
                self.validate(epoch, i)
        logger.materialize()
        if self.metrics_writer is not None:
            self.metrics_writer.flush()
        return logger

    def validate(self, epoch: int, step: int):
        run_validation(
            self.eval_step,
            self.state,
            self.val_loader,
            self.cfg.train.sample_folder,
            epoch,
            step,
            mesh=self.mesh,
        )
        self._save()

    def _stop_requested(self, i: int) -> bool:
        """Preemption check. Multi-process: signals land per process, so
        consensus runs at the (process-aligned) log cadence — a stop on
        any process stops all of them before anyone enters the
        all-process checkpoint barrier alone."""
        if jax.process_count() <= 1:
            return self.preemption.should_stop
        if i % self.log_every == 0:
            return self.preemption.should_stop_global()
        return False

    def _save(self):
        # EVERY process calls orbax save: in multi-controller runs its
        # internal cross-process sync would deadlock a primary-only call
        # (proven by the two-process CLI test); orbax itself writes
        # replicated data from process 0 only
        if self.global_step == self._last_saved_step:
            return  # already checkpointed at this step (validation/preempt)
        self.ckpt.save(self.global_step, self.state)
        self._last_saved_step = self.global_step

    def fit(self, epochs: Optional[int] = None):
        """Train to a TOTAL budget of `epochs`: after a resume the budget
        counts the restored progress, so a supervisor restart (`--ckpt
        latest` after a stall exit) finishes the ORIGINAL run instead of
        appending a whole new one — and the step-indexed lr schedule
        stays within its designed horizon instead of wrapping."""
        n = epochs if epochs is not None else self.cfg.train.epochs
        start = 0
        if self.global_step > 0:
            try:
                spe = len(self.train_loader)
            except TypeError:
                spe = 0
            if self.steps_per_call > 1:
                # _batch_stream drops the remainder below a full K-stack,
                # so an epoch only advances global_step by floor(spe/K)*K
                # optimizer steps — crediting resumed progress against the
                # raw loader length would under-count finished epochs and
                # re-run them (overshooting the budget AND the
                # step-indexed lr schedule horizon)
                spe = (spe // self.steps_per_call) * self.steps_per_call
            if spe > 0:
                start = min(n, self.global_step // spe)
                if start:
                    print(
                        f"resume at step {self.global_step}: "
                        f"{start}/{n} epochs already done", flush=True
                    )
        try:
            for epoch in range(start, n):
                self.train_epoch(epoch)
                if self.preemption.should_stop:
                    break
            # final checkpoint: a run whose length is not a multiple of the
            # validation cadence must not lose its tail (caught by the
            # round-3 quality-run smoke — short runs saved NOTHING)
            if self.global_step > 0:
                self._save()
        finally:
            self.watchdog.stop()
            self.profiler.close()
            if self.metrics_writer is not None:
                self.metrics_writer.close()
