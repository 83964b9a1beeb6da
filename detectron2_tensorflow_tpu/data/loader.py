"""Batched, bucketed, fixed-shape data loading.

Replaces the reference tf.data pipeline (/root/reference/lib/data/
dataloader.py:11-145). TPU-first differences:

  * aspect-ratio bucketing maps to a SMALL STATIC set of (H, W) pad buckets
    from ``cfg.INPUT.PAD_BUCKETS`` so jit compiles once per bucket (the
    reference pads to the dynamic per-batch max, which would recompile);
  * GT is padded to ``cfg.INPUT.MAX_GT_INSTANCES`` with validity masks;
  * a background thread prefetches batches (the tf.data prefetch knob).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from . import native_io, transforms


def pick_bucket(h: int, w: int, buckets: Sequence[tuple]) -> tuple:
    """Smallest bucket that fits (h, w); falls back to the largest."""
    best = None
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            area = bh * bw
            if best is None or area < best[0]:
                best = (area, (bh, bw))
    if best is not None:
        return best[1]
    return max(buckets, key=lambda b: b[0] * b[1])


def pad_sample_to_batch_arrays(
    sample: Dict, bucket, max_gt: int, mini_mask: int, resized_hw=None
) -> Dict:
    """One transformed sample -> fixed-shape numpy arrays.

    With ``resized_hw`` the sample carries no ``image`` (native-IO path —
    the pixels arrive later from one fused C++ batch call) and only the GT
    fields are padded; ``image_size`` comes from ``resized_hw``.
    """
    bh, bw = bucket
    if resized_hw is None:
        img = sample["image"]
        h, w = img.shape[:2]
        image = np.zeros((bh, bw, 3), np.float32)
        image[:h, :w] = img
    else:
        h, w = resized_hw
        image = None

    n = len(sample["boxes"])
    keep = min(n, max_gt)
    gt_boxes = np.zeros((max_gt, 4), np.float32)
    gt_classes = np.zeros((max_gt,), np.int32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_is_crowd = np.zeros((max_gt,), bool)
    gt_boxes[:keep] = sample["boxes"][:keep]
    gt_classes[:keep] = sample["classes"][:keep]
    gt_valid[:keep] = True
    gt_is_crowd[:keep] = sample["is_crowd"][:keep]

    out = {
        "image_size": np.array([h, w], np.int32),
        "original_size": np.asarray(sample.get("original_size", (h, w)), np.int32),
        "image_id": np.asarray(sample.get("image_id", 0), np.int64),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "gt_is_crowd": gt_is_crowd,
    }
    if image is not None:
        out["image"] = image
    if sample.get("masks") is not None:
        gt_masks = np.zeros((max_gt, mini_mask, mini_mask), np.float32)
        gt_masks[:keep] = sample["masks"][:keep]
        out["gt_masks"] = gt_masks
    if sample.get("keypoints") is not None:
        nk = sample["keypoints"].shape[1]
        gt_kp = np.zeros((max_gt, nk, 3), np.float32)
        gt_kp[:keep] = sample["keypoints"][:keep]
        out["gt_keypoints"] = gt_kp
    if sample.get("sem_seg") is not None:
        sem = np.full((bh, bw), -1, np.int32)
        sem[:h, :w] = sample["sem_seg"]
        out["gt_sem_seg"] = sem
    if sample.get("proposals") is not None:
        # Precomputed proposals (MODEL.LOAD_PROPOSALS): fixed top-k slots.
        topk = int(sample.get("proposal_topk", 1000))
        props = np.asarray(sample["proposals"], np.float32).reshape(-1, 4)
        scores = np.asarray(
            sample.get("proposal_scores", np.zeros(len(props))), np.float32
        )
        order = np.argsort(-scores, kind="stable")[:topk]
        pb = np.zeros((topk, 4), np.float32)
        ps = np.full((topk,), -1e10, np.float32)
        pv = np.zeros((topk,), bool)
        pb[: len(order)] = props[order]
        ps[: len(order)] = scores[order]
        pv[: len(order)] = True
        out["proposal_boxes"] = pb
        out["proposal_scores"] = ps
        out["proposal_valid"] = pv
    return out


def native_eval_loader_usable(cfg, dataset) -> bool:
    """The C++ fused decode path can serve eval iff the library builds, the
    dataset exposes file paths, and every file is a JPEG."""
    if not (native_io.available() and hasattr(dataset, "image_path")):
        return False
    return all(
        dataset.image_path(i).lower().endswith((".jpg", ".jpeg"))
        for i in range(len(dataset))
    )


def build_native_eval_loader(
    cfg, dataset, batch_size: Optional[int] = None
) -> Iterator[Dict[str, np.ndarray]]:
    """One eval epoch of fixed-shape batches through the native C++ pipeline
    (native/imageio.cpp): per batch, ONE GIL-free call decodes, shortest-
    edge-resizes and zero-pads every JPEG on all host cores. Emits the same
    fields the evaluator consumes (image / image_size / original_size /
    image_id) with the same bucketing, SAMPLE_1_OF_N, and -1-id final-batch
    padding semantics as build_dataloader(training=False).

    Header-only parses (imgio_jpeg_info) drive bucket assignment, so full
    decodes happen exactly once, inside the batch call.
    """
    batch_size = batch_size or cfg.SOLVER.IMS_PER_BATCH
    buckets = [tuple(b) for b in cfg.INPUT.PAD_BUCKETS]
    min_size = cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST
    max_size = cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST

    order = np.arange(len(dataset))
    if cfg.DATALOADER.SAMPLE_1_OF_N > 1:
        order = order[:: cfg.DATALOADER.SAMPLE_1_OF_N]

    def resized(h, w):
        if min_size <= 0:
            return h, w
        scale = min_size / min(h, w)
        if max(h, w) * scale > max_size:
            scale = max_size / max(h, w)
        return int(round(h * scale)), int(round(w * scale))

    pools: Dict[tuple, List[int]] = {}
    metas: Dict[int, tuple] = {}  # idx -> (orig_h, orig_w)

    def emit(bucket, idxs, pad_to):
        datas = [open(dataset.image_path(i), "rb").read() for i in idxs]
        images, sizes = native_io.decode_resize_pad_batch(
            datas, min_size, max_size, bucket
        )
        ids = np.asarray([dataset.image_id(i) for i in idxs], np.int64)
        orig = np.asarray([metas[i] for i in idxs], np.int32)
        if pad_to > len(idxs):  # repeat the last sample; mark as padding
            reps = pad_to - len(idxs)
            images = np.concatenate([images, np.repeat(images[-1:], reps, 0)])
            sizes = np.concatenate([sizes, np.repeat(sizes[-1:], reps, 0)])
            orig = np.concatenate([orig, np.repeat(orig[-1:], reps, 0)])
            ids = np.concatenate([ids, np.full((reps,), -1, np.int64)])
        return {
            "image": images,
            "image_size": sizes,
            "original_size": orig,
            "image_id": ids,
        }

    for i in order:
        with open(dataset.image_path(int(i)), "rb") as f:
            head = f.read(1 << 16)  # JPEG dims live in the first segments
        try:
            oh, ow = native_io.jpeg_info(head)
        except ValueError:
            with open(dataset.image_path(int(i)), "rb") as f:
                oh, ow = native_io.jpeg_info(f.read())
        metas[int(i)] = (oh, ow)
        bucket = pick_bucket(*resized(oh, ow), buckets)
        pools.setdefault(bucket, []).append(int(i))
        if len(pools[bucket]) == batch_size:
            yield emit(bucket, pools.pop(bucket), batch_size)
    for bucket, idxs in pools.items():
        yield emit(bucket, idxs, batch_size)


def native_train_loader_usable(cfg, dataset) -> bool:
    """The fused C++ train path can serve iff the library builds, the
    dataset exposes GT-only access over all-JPEG files, and the active
    augmentations reduce to {horizontal flip, shortest-edge resize} with
    mini-mask targets (the COCO defaults). Anything else falls back to the
    python pipeline."""
    a = cfg.AUGMENT
    if any([
        a.CROP.ENABLED, a.VERTICAL_FLIP, a.ROTATE,
        a.PIXEL_VALUE_SCALE.ENABLED, a.ADJUST_BRIGHTNESS.ENABLED,
        a.ADJUST_CONSTRACT.ENABLED, a.ADJUST_HUE.ENABLED,
        a.ADJUST_SATURATION.ENABLED, a.DISTORT_COLOR.ENABLED,
        a.JITTER_BOX.ENABLED,
    ]):
        return False
    if cfg.MODEL.LOAD_PROPOSALS or cfg.DATALOADER.LOAD_SEMANTIC_MASKS:
        return False
    if not cfg.TRANSFORM.RESIZE.USE_MINI_MASKS:
        return False
    if not (
        native_io.available()
        and hasattr(dataset, "sample_gt")
        and hasattr(dataset, "image_path")
    ):
        return False
    return all(
        dataset.image_path(i).lower().endswith((".jpg", ".jpeg"))
        for i in range(len(dataset))
    )


def build_native_train_loader(
    cfg,
    dataset,
    batch_size: Optional[int] = None,
    seed: int = 0,
    num_prefetch: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Training batches with the pixel work in C++ (native/imageio.cpp).

    Per sample, the reader pool builds GT only (no decode): polygons
    rasterize at original size, then ONE fused native call produces the
    mini-mask targets without ever materializing per-instance resized masks
    (the python path's dominant host op). Per batch, ONE GIL-free native
    call decodes + per-image-shortest-edge-resizes + flips + pads every
    JPEG across all host cores. Augmentation semantics match
    transforms.run for the supported set (see native_train_loader_usable);
    batches carry exactly the fields build_dataloader(training=True) emits.
    """
    batch_size = batch_size or cfg.SOLVER.IMS_PER_BATCH
    buckets = [tuple(b) for b in cfg.INPUT.PAD_BUCKETS]
    max_gt = cfg.INPUT.MAX_GT_INSTANCES
    mini = cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE
    max_size = cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN
    rng = np.random.default_rng(seed)
    num_readers = max(1, cfg.DATALOADER.NUM_READERS)

    def index_stream():
        while True:
            order = np.arange(len(dataset))
            if cfg.DATALOADER.SHUFFLE:
                rng.shuffle(order)
            yield from (int(i) for i in order)

    def load_one(args):
        i, seed_i = args
        gt = dataset.sample_gt(i)
        gt, min_size, flip, resized_hw = transforms.run_gt_native(
            cfg, gt, np.random.default_rng(seed_i)
        )
        arrays = pad_sample_to_batch_arrays(
            gt, (0, 0), max_gt, mini, resized_hw=resized_hw
        )
        return arrays, dataset.image_path(i), min_size, flip, resized_hw

    def sample_stream():
        import collections
        import concurrent.futures as cf

        seeds = np.random.default_rng(seed).integers(0, 2**31, size=1 << 20)
        tagged = (
            (i, int(seeds[k % len(seeds)]))
            for k, i in enumerate(index_stream())
        )
        if num_readers == 1:
            for args in tagged:
                yield load_one(args)
            return
        with cf.ThreadPoolExecutor(num_readers) as pool:
            inflight = collections.deque()
            for args in tagged:
                inflight.append(pool.submit(load_one, args))
                if len(inflight) >= 2 * num_readers:
                    yield inflight.popleft().result()

    def emit(batch):
        arrays, paths, min_sizes, flips, _ = zip(*batch)
        datas = [open(p, "rb").read() for p in paths]
        bucket = pick_bucket(
            max(a["image_size"][0] for a in arrays),
            max(a["image_size"][1] for a in arrays),
            buckets,
        )
        images, hw = native_io.train_image_batch(
            datas, list(min_sizes), max_size, list(flips), bucket
        )
        out = {k: np.stack([a[k] for a in arrays]) for k in arrays[0]}
        out["image"] = images
        # the C++ resize rule must agree with the python-side bucketing
        assert (hw == np.stack([a["image_size"] for a in arrays])).all()
        return out

    def batch_stream():
        pools: Dict[tuple, List] = {}
        for s in sample_stream():
            nh, nw = s[4]
            bucket = pick_bucket(nh, nw, buckets)
            pools.setdefault(bucket, []).append(s)
            if len(pools[bucket]) == batch_size:
                yield emit(pools.pop(bucket))

    n_prefetch = (
        num_prefetch
        if num_prefetch is not None
        else max(1, cfg.DATALOADER.NUM_PREFETCH_BATCHES)
    )
    q: queue.Queue = queue.Queue(maxsize=n_prefetch)
    _SENTINEL = object()

    def worker():
        try:
            for b in batch_stream():
                q.put(b)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item


def build_dataloader(
    cfg,
    dataset,
    training: bool,
    batch_size: Optional[int] = None,
    seed: int = 0,
    num_prefetch: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield fixed-shape batch dicts forever (training) or one epoch (eval).

    ``dataset``: indexable returning transform-ready sample dicts
    (e.g. CocoDataset). Batches group samples by pad bucket (aspect-ratio
    bucketing with static shapes).
    """
    batch_size = batch_size or cfg.SOLVER.IMS_PER_BATCH
    buckets = [tuple(b) for b in cfg.INPUT.PAD_BUCKETS]
    max_gt = cfg.INPUT.MAX_GT_INSTANCES
    mini = cfg.TRANSFORM.RESIZE.MINI_MASK_SIZE
    rng = np.random.default_rng(seed)

    num_readers = max(1, cfg.DATALOADER.NUM_READERS)

    def index_stream():
        while True:
            order = np.arange(len(dataset))
            if training and cfg.DATALOADER.SHUFFLE:
                rng.shuffle(order)
            if not training and cfg.DATALOADER.SAMPLE_1_OF_N > 1:
                order = order[:: cfg.DATALOADER.SAMPLE_1_OF_N]
            yield from (int(i) for i in order)
            if not training:
                return

    proposal_topk = (
        cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
        if training
        else cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
    )

    def load_one(args):
        i, seed_i = args
        raw = dataset[i]
        orig_size = raw["image"].shape[:2]
        # Per-sample rng keeps augmentation deterministic under parallelism.
        s, _ = transforms.run(cfg, raw, training, np.random.default_rng(seed_i))
        s["original_size"] = orig_size
        if s.get("proposals") is not None:
            s["proposal_topk"] = proposal_topk
        return s

    def sample_stream():
        """Decode+augment on a reader pool (cv2/numpy release the GIL);
        order preserved (NUM_READERS in-flight)."""
        import concurrent.futures as cf

        seeds = np.random.default_rng(seed).integers(0, 2**31, size=1 << 20)
        tagged = (
            (i, int(seeds[k % len(seeds)]))
            for k, i in enumerate(index_stream())
        )
        if num_readers == 1:
            for args in tagged:
                yield load_one(args)
            return
        # NOTE: pool.map would eagerly drain the (infinite) index stream;
        # keep a bounded window of in-flight futures instead.
        import collections

        with cf.ThreadPoolExecutor(num_readers) as pool:
            inflight = collections.deque()
            for args in tagged:
                inflight.append(pool.submit(load_one, args))
                if len(inflight) >= 2 * num_readers:
                    yield inflight.popleft().result()
            while inflight:
                yield inflight.popleft().result()

    def batch_stream():
        pools: Dict[tuple, List[Dict]] = {}
        tail: List[Dict] = []
        for s in sample_stream():
            h, w = s["image"].shape[:2]
            bucket = pick_bucket(h, w, buckets)
            pools.setdefault(bucket, []).append(
                pad_sample_to_batch_arrays(s, bucket, max_gt, mini)
            )
            if len(pools[bucket]) == batch_size:
                batch = pools.pop(bucket)
                yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}
        if not training:
            # Flush remainders, padding by repeating the last sample so the
            # batch shape stays static; callers drop duplicates by image_id.
            for bucket, batch in pools.items():
                while len(batch) < batch_size:
                    pad = dict(batch[-1])
                    pad["image_id"] = np.asarray(-1, np.int64)  # marks padding
                    batch.append(pad)
                yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}

    n_prefetch = (
        num_prefetch
        if num_prefetch is not None
        else max(1, cfg.DATALOADER.NUM_PREFETCH_BATCHES)
    )
    q: queue.Queue = queue.Queue(maxsize=n_prefetch)
    _SENTINEL = object()

    def worker():
        try:
            for b in batch_stream():
                q.put(b)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
