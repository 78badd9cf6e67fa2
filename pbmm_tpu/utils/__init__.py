from pbmm_tpu.utils.metrics import psnr, ssim

__all__ = ["psnr", "ssim"]
