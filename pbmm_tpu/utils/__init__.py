from pbmm_tpu.utils.metrics import psnr, ssim, ssim_global

__all__ = ["psnr", "ssim"]
