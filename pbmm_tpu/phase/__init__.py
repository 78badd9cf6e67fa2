from pbmm_tpu.phase.amplify import (
    pyramid_phase_amplify,
    pyramid_phase_amplify_naive,
)
from pbmm_tpu.phase.standard import standard_phase_amplify, bandpass_weight_map
from pbmm_tpu.phase.temporal import TemporalState, temporal_init, temporal_apply

__all__ = [
    "pyramid_phase_amplify",
    "pyramid_phase_amplify_naive",
    "standard_phase_amplify",
    "bandpass_weight_map",
    "TemporalState",
    "temporal_init",
    "temporal_apply",
]
