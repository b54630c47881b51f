from chore_tpu.data.loader import DataLoader, collate
from chore_tpu.data.paths import DataPaths, load_kpts_json, load_mocap, load_paths
from chore_tpu.data.test_data import TestImagePrep
from chore_tpu.data.train_data import BehaveTrainData

__all__ = [
    "DataLoader",
    "collate",
    "DataPaths",
    "load_kpts_json",
    "load_mocap",
    "load_paths",
    "TestImagePrep",
    "BehaveTrainData",
]
