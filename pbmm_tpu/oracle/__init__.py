from pbmm_tpu.oracle.reference import oracle_magnify_pair, oracle_magnify_video
from pbmm_tpu.oracle.synthetic import oscillating_bar, oscillating_gaussian_blob

__all__ = [
    "oracle_magnify_pair",
    "oracle_magnify_video",
    "oscillating_bar",
    "oscillating_gaussian_blob",
]
