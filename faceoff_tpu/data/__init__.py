from faceoff_tpu.data.dataset import TemporalAlignmentDataset
from faceoff_tpu.data.pipeline import DataLoader

__all__ = ["TemporalAlignmentDataset", "DataLoader"]
