from hnd_ghnd_tpu.data.coco import CocoDataset, check_if_valid_target
from hnd_ghnd_tpu.data.loader import DetectionLoader, get_coco_data_loaders

__all__ = ["CocoDataset", "check_if_valid_target", "DetectionLoader",
           "get_coco_data_loaders"]
