from chore_tpu.data.loader import DataLoader, collate
from chore_tpu.data.paths import DataPaths, load_kpts_json, load_mocap, load_paths
from chore_tpu.data.train_data import BehaveTrainData

__all__ = [
    "BehaveTrainData",
    "DataLoader",
    "DataPaths",
    "TestImagePrep",
    "collate",
    "load_kpts_json",
    "load_mocap",
    "load_paths",
]


def __getattr__(name):
    # lazy: test_data pulls in the camera module (jax); loader worker
    # processes must be able to import this package without touching jax
    if name == "TestImagePrep":
        from chore_tpu.data.test_data import TestImagePrep

        return TestImagePrep
    raise AttributeError(name)
