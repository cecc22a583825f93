from sherf_tpu.eval.metrics import psnr_np, ssim_np, crop_metrics
from sherf_tpu.eval.test_loop import run_eval

__all__ = ["psnr_np", "ssim_np", "crop_metrics", "run_eval"]
