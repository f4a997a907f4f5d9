from faceoff_tpu.evaluation.frechet import (
    feature_stats,
    fid,
    frechet_distance,
    make_fd_vgg,
    make_fd_video,
    make_fd_video_features,
    motion_features,
    vgg_features,
)
from faceoff_tpu.evaluation.metrics import psnr, ssim, evaluate_reconstruction

__all__ = [
    "psnr",
    "ssim",
    "evaluate_reconstruction",
    "feature_stats",
    "fid",
    "frechet_distance",
    "make_fd_vgg",
    "make_fd_video",
    "make_fd_video_features",
    "motion_features",
    "vgg_features",
]
