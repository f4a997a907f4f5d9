from faceoff_tpu.ops.swap import prepare_swap_batch
from faceoff_tpu.ops.video import fold_time, unfold_time
from faceoff_tpu.ops.vq import (
    VQCodebook,
    init_codebook,
    vq_lookup,
    vq_stats,
    vq_ema_update,
    vq_quantize_train,
)

__all__ = [
    "prepare_swap_batch",
    "fold_time",
    "unfold_time",
    "VQCodebook",
    "init_codebook",
    "vq_lookup",
    "vq_stats",
    "vq_ema_update",
    "vq_quantize_train",
]
