from faceoff_tpu.evaluation.metrics import psnr, ssim, evaluate_reconstruction

__all__ = ["psnr", "ssim", "evaluate_reconstruction"]
