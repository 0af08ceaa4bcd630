from hnd_ghnd_tpu.split.deploy import (SplitRCNN, split_rcnn_model,
                                       pack_wire, unpack_wire)
from hnd_ghnd_tpu.split.export import export_split, load_exported

__all__ = ["SplitRCNN", "split_rcnn_model", "pack_wire", "unpack_wire",
           "export_split", "load_exported"]
