from hnd_ghnd_tpu.split.deploy import (SplitRCNN, split_rcnn_model,
                                       pack_wire, unpack_wire)

__all__ = ["SplitRCNN", "split_rcnn_model", "pack_wire", "unpack_wire"]
