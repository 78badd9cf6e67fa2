from pbmm_tpu.engine.pipeline import magnify_frame_pair, preprocess, postprocess
from pbmm_tpu.engine.video import magnify_video, video_init, video_step
from pbmm_tpu.engine.state import save_state, load_state

__all__ = [
    "magnify_frame_pair",
    "preprocess",
    "postprocess",
    "magnify_video",
    "video_init",
    "video_step",
    "save_state",
    "load_state",
]
