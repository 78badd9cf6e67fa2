from pbmm_tpu.io.video import load_video, save_video

__all__ = ["load_video", "save_video"]
