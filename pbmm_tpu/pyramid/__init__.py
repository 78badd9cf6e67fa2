from pbmm_tpu.pyramid.filters import (
    radial_filter_bank,
    steerable_filter_bank,
    filter_bank,
    amplified_level_flags,
)

__all__ = [
    "radial_filter_bank",
    "steerable_filter_bank",
    "filter_bank",
    "amplified_level_flags",
]
