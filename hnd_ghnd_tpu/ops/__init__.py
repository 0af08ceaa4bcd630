from hnd_ghnd_tpu.ops import boxes, anchors, nms, roi_align

__all__ = ["boxes", "anchors", "nms", "roi_align"]
