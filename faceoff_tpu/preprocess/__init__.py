from faceoff_tpu.preprocess.face_crop import process_video, process_videos
from faceoff_tpu.preprocess.landmarks import generate_landmarks_for_video

__all__ = ["process_video", "process_videos", "generate_landmarks_for_video"]
