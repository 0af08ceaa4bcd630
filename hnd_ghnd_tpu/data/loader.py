"""Batched detection data loader with static-shape bucketing.

Replaces the reference's DataLoader stack (src/utils/data_util.py:18-48 +
GroupedBatchSampler, src/structure/sampler.py): aspect-ratio grouping here
guarantees every batch shares one padded bucket (one compiled program per
bucket), per-host sharding replaces DistributedSampler, and a thread pool
overlaps JPEG decode/augment with device compute.

Batch layout handed to jitted code:
  images          [B, H, W, 3] float32 in [0, 1]   (bucket-padded)
  image_sizes     [B, 2] int32   valid (h, w) inside the bucket
  original_sizes  [B, 2] int32   pre-resize (h, w)
Targets (train):
  boxes [B, G, 4] f32, labels [B, G] i32, boxes_valid [B, G] bool
(keypoints/masks stay host-side per batch for the loss/eval stages that
need them).
"""
from __future__ import annotations

import random
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from hnd_ghnd_tpu.data import native_prep
from hnd_ghnd_tpu.data import transforms as T
from hnd_ghnd_tpu.data.coco import CocoDataset

MAX_GT = 100


MASK_CROP_SIZE = 112  # box-aligned gt mask raster resolution (+1px border)


def mask_box_crop(mask: "np.ndarray", box) -> "np.ndarray":
    """Box-aligned gt raster: sample the full-res mask at the pixel centers
    of an R x R grid over the gt box (exact bilinear — the same sample
    points reference project_masks_on_boxes reads from the full-image
    raster), with a 1px zero border so device-side projection decays to
    zero outside the box.  Returns [R+2, R+2] float16."""
    import cv2
    r = MASK_CROP_SIZE
    x1, y1, x2, y2 = [float(v) for v in box]
    gw = max(x2 - x1, 1.0)
    gh = max(y2 - y1, 1.0)
    affine = np.asarray([[gw / r, 0.0, x1 + 0.5 * gw / r],
                         [0.0, gh / r, y1 + 0.5 * gh / r]], np.float32)
    crop = cv2.warpAffine(
        mask.astype(np.float32), affine, (r, r),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    out = np.zeros((r + 2, r + 2), np.float16)
    out[1:-1, 1:-1] = crop.astype(np.float16)
    return out


def _pad_targets(targets: List[Dict], max_gt: int = MAX_GT,
                 bucket=None) -> Dict[str, np.ndarray]:
    b = len(targets)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = np.zeros((b, max_gt), np.int32)
    valid = np.zeros((b, max_gt), bool)
    with_masks = any("masks" in t for t in targets) and bucket is not None
    with_kps = any("keypoints" in t for t in targets)
    if with_masks:
        r = MASK_CROP_SIZE
        masks_crop = np.zeros((b, max_gt, r + 2, r + 2), np.float16)
    if with_kps:
        kps = np.zeros((b, max_gt, 17, 3), np.float32)
    for i, t in enumerate(targets):
        g = min(len(t["boxes"]), max_gt)
        boxes[i, :g] = t["boxes"][:g]
        labels[i, :g] = t["labels"][:g]
        valid[i, :g] = True
        if with_masks and "masks" in t and g:
            for j in range(g):
                masks_crop[i, j] = mask_box_crop(t["masks"][j],
                                                 t["boxes"][j])
        if with_kps and "keypoints" in t and g:
            kps[i, :g] = t["keypoints"][:g]
    out = {"boxes": boxes, "labels": labels, "boxes_valid": valid}
    if with_masks:
        out["masks_crop"] = masks_crop
    if with_kps:
        out["keypoints"] = kps
    return out


class _RawItem:
    """Decoded-but-unresized image + its prep geometry (fused native path).

    Exposes ``shape`` as the RESIZED dims so bucket picking and size
    bookkeeping read identically to the eager-resize path.
    """

    __slots__ = ("img", "nh", "nw", "flip")

    def __init__(self, img: np.ndarray, nh: int, nw: int, flip: bool):
        self.img = img
        self.nh = nh
        self.nw = nw
        self.flip = flip

    @property
    def shape(self):
        return (self.nh, self.nw, 3)


def _bounded_map(pool: ThreadPoolExecutor, fn, items, window: int):
    """pool.map with a bounded in-flight window (submit-as-you-consume)."""
    it = iter(items)
    futs = deque()
    for _ in range(max(window, 1)):
        try:
            futs.append(pool.submit(fn, next(it)))
        except StopIteration:
            break
    while futs:
        result = futs.popleft().result()
        try:
            futs.append(pool.submit(fn, next(it)))
        except StopIteration:
            pass
        yield result


class DetectionLoader:
    """Iterates (device_batch, target_batch, host_targets) tuples."""

    def __init__(self, dataset: CocoDataset, batch_size: int, *,
                 training: bool, min_sizes: Sequence[int] = (800,),
                 max_size: int = 1333,
                 buckets: Sequence[Tuple[int, int]] = T.DEFAULT_BUCKETS,
                 hflip_prob: float = 0.5, seed: int = 0,
                 num_workers: int = 4, shard_index: int = 0,
                 num_shards: int = 1, max_gt: int = MAX_GT,
                 pixel_dtype: str = "float32"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.training = training
        self.min_sizes = tuple(min_sizes)
        self.max_size = max_size
        self.buckets = tuple(buckets)
        self.hflip_prob = hflip_prob if training else 0.0
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.max_gt = max_gt
        # uint8 wire: batch pixels stay rounded u8 codes (4x less host
        # traffic and H2D bytes); the jit boundary dequantizes with a fused
        # *1/255 (parallel/mesh.images_to_compute).  Geometry identical to
        # the f32 path; the only delta is the <=0.5/255 resize rounding.
        assert pixel_dtype in ("float32", "uint8"), pixel_dtype
        self.pixel_dtype = np.uint8 if pixel_dtype == "uint8" else np.float32
        self._use_native_prep = native_prep.available() and (
            pixel_dtype == "float32" or native_prep.supports_u8())

    def set_epoch(self, epoch: int) -> None:
        """Distributed-shuffle seed bump (DistributedSampler.set_epoch
        analog, reference src/mimic_runner.py:83-84)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        if self.training:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _prepare(self, index: int):
        # per-(seed, epoch, index) rng: deterministic regardless of the
        # thread pool's completion order
        rng = random.Random((self.seed * 1_000_003 + self.epoch) * 7919
                            + index)
        img, target = self.dataset[index]
        oh, ow = img.shape[:2]
        flip = self.training and rng.random() < self.hflip_prob
        min_size = (rng.choice(self.min_sizes) if self.training
                    else self.min_sizes[-1])
        if self._use_native_prep:
            # fused path: pixels stay raw uint8; the native kernel applies
            # flip+resize+normalize+pad in one pass at batch-emit time.
            # Target geometry is transformed here exactly as T.hflip/T.resize
            # would.
            if flip:
                target = T.hflip_targets(target, ow)
            nh, nw, _ = T.resize_geometry(oh, ow, min_size, self.max_size)
            target = T.resize_targets(target, oh, ow, nh, nw)
            target["original_size"] = (oh, ow)
            return _RawItem(img, nh, nw, flip), target
        if flip:
            img, target = T.hflip(img, target)
        img, target, _ = T.resize(img, target, min_size, self.max_size)
        target["original_size"] = (oh, ow)
        return img, target

    def _order(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.training:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.shard_index::self.num_shards]
        return idx

    def __iter__(self) -> Iterator[Tuple[Dict, Dict, List[Dict]]]:
        order = self._order()
        pool = ThreadPoolExecutor(max_workers=max(self.num_workers, 1))
        try:
            # bounded prefetch window: ThreadPoolExecutor.map would submit
            # the WHOLE epoch eagerly, decoding arbitrarily far ahead of
            # consumption (tens of GB on full COCO); keep a fixed number of
            # in-flight items instead
            prepared = _bounded_map(pool, self._prepare, order,
                                    window=max(4 * self.num_workers,
                                               2 * self.batch_size))
            # group into same-bucket batches (aspect-ratio grouping)
            pending: Dict[Tuple[int, int], List] = {}
            for img, target in prepared:
                bucket = T.pick_bucket(img.shape[0], img.shape[1], self.buckets)
                pending.setdefault(bucket, []).append((img, target))
                if len(pending[bucket]) == self.batch_size:
                    yield self._emit(bucket, pending.pop(bucket))
            # flush remainders: pad batch by repeating the last image so
            # shapes stay static (extra rows carry valid=False targets and
            # are dropped from eval by image_id bookkeeping)
            for bucket, items in pending.items():
                if not items:
                    continue
                n_real = len(items)
                while len(items) < self.batch_size:
                    im, tg = items[-1]
                    items.append((im, dict(tg)))  # fresh dict: padding flag
                yield self._emit(bucket, items, n_real)
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def _emit(self, bucket, items, n_real: Optional[int] = None):
        if self._use_native_prep:
            bh, bw = bucket
            imgs = np.empty((len(items), bh, bw, 3), self.pixel_dtype)
            for i, (raw, _) in enumerate(items):
                native_prep.prep_into(raw.img, raw.nh, raw.nw, raw.flip,
                                      imgs[i])
        else:
            imgs = np.stack([T.pad_to(im, bucket) for im, _ in items], axis=0)
            if self.pixel_dtype == np.uint8:
                imgs = imgs.astype(np.uint8)
            else:
                imgs = imgs.astype(np.float32) / 255.0
        sizes = np.asarray([[im.shape[0], im.shape[1]] for im, _ in items],
                           np.int32)
        orig = np.asarray([t["original_size"] for _, t in items], np.int32)
        batch = {"images": imgs, "image_sizes": sizes, "original_sizes": orig}
        host_targets = [t for _, t in items]
        for k, t in enumerate(host_targets):
            t["is_padding"] = n_real is not None and k >= n_real
        tgt = _pad_targets(host_targets, self.max_gt, bucket=bucket)
        return batch, tgt, host_targets


def get_coco_data_loaders(dataset_config: Dict[str, Any], batch_size: int, *,
                          with_masks: bool = False,
                          with_keypoints: bool = False,
                          min_sizes: Sequence[int] = (800,),
                          max_size: int = 1333,
                          buckets: Sequence[Tuple[int, int]] = T.DEFAULT_BUCKETS,
                          shard_index: int = 0, num_shards: int = 1,
                          eval_batch_size: int = 1,
                          val_batch_size: Optional[int] = None,
                          shard_eval: bool = False,
                          pixel_dtype: str = "float32"):
    """Build (train, val, test) loaders from the reference dataset YAML block
    (src/utils/data_util.py:18-48).  val/test default to batch_size=1 like
    the reference (data_util.py:44-47); ``eval_batch_size`` raises it for
    TPU throughput (remainder batches are padded and unpadded around eval).
    ``val_batch_size`` overrides it for the VAL split only — per-epoch val
    has no reference batch-1 protocol constraint (that applies to the final
    TEST pass), so shipped configs run it batched (``tpu.eval_batch_size``)."""
    splits = dataset_config["splits"]
    num_workers = int(dataset_config.get("num_workers", 4))
    out = []
    for name in ("train", "val", "test"):
        cfg = splits[name]
        ds = CocoDataset(
            cfg["images"], cfg["annotations"],
            remove_non_annotated=bool(cfg.get("remove_non_annotated_imgs")),
            jpeg_quality=cfg.get("jpeg_quality"),
            with_masks=with_masks, with_keypoints=with_keypoints)
        training = name == "train"
        if training:
            bs = batch_size
        elif name == "val" and val_batch_size is not None:
            bs = val_batch_size
        else:
            bs = eval_batch_size
        out.append(DetectionLoader(
            ds, bs,
            training=training,
            min_sizes=min_sizes, max_size=max_size, buckets=buckets,
            num_workers=num_workers,
            shard_index=shard_index if (training or shard_eval) else 0,
            num_shards=num_shards if (training or shard_eval) else 1,
            pixel_dtype=pixel_dtype))
    return tuple(out)
