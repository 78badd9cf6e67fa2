from pbmm_tpu.spectral.fft import fft2_centered, ifft2_centered

__all__ = ["fft2_centered", "ifft2_centered"]
