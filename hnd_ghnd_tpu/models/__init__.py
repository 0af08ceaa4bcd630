from hnd_ghnd_tpu.models import layers, resnet, bottleneck, fpn

__all__ = ["layers", "resnet", "bottleneck", "fpn"]
