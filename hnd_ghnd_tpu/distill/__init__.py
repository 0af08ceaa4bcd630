from hnd_ghnd_tpu.distill.losses import GeneralizedCustomLoss, get_loss
from hnd_ghnd_tpu.distill.box import DistillationBox

__all__ = ["GeneralizedCustomLoss", "get_loss", "DistillationBox"]
