from chore_tpu.behave.readers import (
    FrameDataReader,
    KinectCalib,
    KinectFrameReader,
    KinectTransform,
    SeqInfo,
    load_intrinsics,
    load_kinect_poses,
    load_kinect_poses_back,
)

__all__ = [
    "FrameDataReader",
    "KinectCalib",
    "KinectFrameReader",
    "KinectTransform",
    "SeqInfo",
    "load_intrinsics",
    "load_kinect_poses",
    "load_kinect_poses_back",
]
