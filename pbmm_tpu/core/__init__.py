from pbmm_tpu.core.color import rgb_to_yiq, yiq_to_rgb
from pbmm_tpu.core.window import (
    Geometry,
    geometry_for,
    hann2d,
    pad_center,
    crop_center,
    gaussian_blur5,
    blur_taps,
)

__all__ = [
    "rgb_to_yiq",
    "yiq_to_rgb",
    "Geometry",
    "geometry_for",
    "hann2d",
    "pad_center",
    "crop_center",
    "gaussian_blur5",
    "blur_taps",
]
