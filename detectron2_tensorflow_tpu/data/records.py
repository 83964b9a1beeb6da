"""Sharded record building and reading (offline COCO -> TFRecords).

Parity target: /root/reference/lib/data_tools/ (builder.py:5-11,
build_coco_det.py:16-133, tfrecord_creation_utils.py:4-24). The storage
format stays TFRecord/tf.Example (byte-interoperable with the reference's
datasets — pinned by TF cross-read tests), but both directions run through
the SELF-CONTAINED codec in data/tfrecord_codec.py: no TensorFlow anywhere
in this framework. Reading is lazy (offset index per shard, payloads
fetched + CRC-checked on demand) instead of materializing every record in
memory.
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np


from . import tfrecord_codec as codec


def _bytes(v):
    return codec.bytes_feature([v])


def _bytes_list(v):
    return codec.bytes_feature(v)


def _floats(v):
    return codec.float_feature(v)


def _ints(v):
    return codec.int64_feature(v)


def _png_encode(mask: np.ndarray) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".png", mask.astype(np.uint8))
    assert ok
    return buf.tobytes()


def _png_rgb_encode(rgb: np.ndarray) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".png", cv2.cvtColor(rgb.astype(np.uint8), cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


def create_example(sample: Dict, image_bytes: bytes) -> bytes:
    """Sample dict (+ pre-encoded image) -> serialized tf.train.Example.

    Field names follow the reference TfExampleFields vocabulary.
    """
    boxes = np.asarray(sample["boxes"], np.float32).reshape(-1, 4)
    h, w = sample["height"], sample["width"]
    feature = {
        "image/encoded": _bytes(image_bytes),
        "image/format": _bytes(b"jpeg"),
        "image/height": _ints([h]),
        "image/width": _ints([w]),
        "image/source_id": _bytes(str(sample["image_id"]).encode()),
        "image/object/bbox/xmin": _floats(boxes[:, 0] / w),
        "image/object/bbox/ymin": _floats(boxes[:, 1] / h),
        "image/object/bbox/xmax": _floats(boxes[:, 2] / w),
        "image/object/bbox/ymax": _floats(boxes[:, 3] / h),
        "image/object/class/label": _ints(sample["classes"]),
        "image/object/is_crowd": _ints(np.asarray(sample["is_crowd"], np.int64)),
    }
    if sample.get("areas") is not None and len(sample["areas"]):
        feature["image/object/area"] = _floats(sample["areas"])
    if sample.get("masks") is not None and len(sample["masks"]):
        feature["image/object/mask"] = _bytes_list(
            [_png_encode(m) for m in sample["masks"]]
        )
    if sample.get("sem_seg") is not None:
        # Panoptic/semantic records: the contiguous-class map stored as an
        # RGB id-map PNG (reference build_coco_pano.py:113-116 + fields
        # TfExampleFields.sem_seg = 'image/sem_seg'). The -1 ignore label
        # maps to the all-255 sentinel (id 16777215) inside the PNG.
        from .panoptic import id_to_rgb

        sem = np.asarray(sample["sem_seg"], np.int64)
        sem = np.where(sem < 0, 256**3 - 1, sem)
        feature["image/sem_seg"] = _bytes(_png_rgb_encode(id_to_rgb(sem)))
    return codec.encode_example(feature)


def build_records(
    dataset,
    output_pattern: str,
    num_shards: int = 16,
) -> List[str]:
    """Write a CocoDataset-like dataset into sharded TFRecords.

    ``output_pattern``: e.g. "out/train.record"; shards get -00000-of-00016
    suffixes (the reference's sharding convention).
    """
    import cv2

    paths = [
        f"{output_pattern}-{i:05d}-of-{num_shards:05d}" for i in range(num_shards)
    ]
    os.makedirs(os.path.dirname(output_pattern) or ".", exist_ok=True)
    writers = [open(p, "wb") for p in paths]
    try:
        for idx in range(len(dataset)):
            s = dataset[idx]
            img = s["image"]
            # Copy the original encoded bytes when the source is already a
            # JPEG file (the reference embeds the file bytes verbatim,
            # build_coco_det.py:16-133) — lossless and faster than
            # re-encoding; fall back to cv2 JPEG encoding otherwise.
            path = (
                dataset.image_path(idx)
                if hasattr(dataset, "image_path") else None
            )
            if path and path.lower().endswith((".jpg", ".jpeg")):
                with open(path, "rb") as fh:
                    buf = np.frombuffer(fh.read(), np.uint8)
            else:
                ok, buf = cv2.imencode(
                    ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                )
                assert ok
            ex = create_example(
                {
                    "image_id": s.get("image_id", idx),
                    "height": img.shape[0],
                    "width": img.shape[1],
                    "boxes": s["boxes"],
                    "classes": s["classes"],
                    "is_crowd": s["is_crowd"],
                    "areas": s.get("areas"),
                    "masks": s.get("masks"),
                    "sem_seg": s.get("sem_seg"),
                },
                buf.tobytes(),
            )
            codec.write_record(writers[idx % num_shards], ex)
    finally:
        for w in writers:
            w.close()
    return paths


class TFRecordDataset:
    """Indexable view over sharded TFRecords producing numpy sample dicts.

    Shards are INDEXED at construction (payload offsets only — no record
    bytes are held in memory); __getitem__ seeks, CRC-checks and decodes
    one example on demand, so the loader's shuffle-by-index works the same
    as with CocoDataset at any dataset size.
    """

    def __init__(self, file_pattern: str, load_masks: bool = True):
        import glob as _glob

        self.files = sorted(_glob.glob(file_pattern))
        assert self.files, f"no records match {file_pattern}"
        self.load_masks = load_masks
        # Class-name vocabulary: build_records.py writes category_map.json
        # next to the shards; per-category AP tables
        # (EVAL.INCLUDE_METRICS_PER_CATEGORY, reference evaluation.py:107)
        # need the names, which the records themselves don't carry.
        self.class_names = None
        cat_path = os.path.join(os.path.dirname(self.files[0]),
                                "category_map.json")
        if os.path.exists(cat_path):
            with open(cat_path) as fp:
                self.class_names = json.load(fp).get("thing_classes")
        self._index: List[tuple] = []  # (file_idx, offset, length)
        for fi, f in enumerate(self.files):
            for off, length in codec.index_records(f):
                self._index.append((fi, off, length))

    def __len__(self) -> int:
        return len(self._index)

    def _feature(self, f, name, kind, default):
        if name not in f:
            return default
        k, v = f[name]
        assert k == kind, (name, k, kind)
        return v

    def __getitem__(self, idx: int) -> Dict:
        import cv2

        fi, off, length = self._index[idx]
        payload = codec.read_record_at(
            self.files[fi], off, length, verify=True
        )
        f = codec.decode_example(payload)

        img = cv2.imdecode(
            np.frombuffer(self._feature(f, "image/encoded", "bytes", [b""])[0],
                          np.uint8),
            cv2.IMREAD_COLOR,
        )
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        empty_f = np.zeros(0, np.float32)
        xmin = self._feature(f, "image/object/bbox/xmin", "float", empty_f) * w
        ymin = self._feature(f, "image/object/bbox/ymin", "float", empty_f) * h
        xmax = self._feature(f, "image/object/bbox/xmax", "float", empty_f) * w
        ymax = self._feature(f, "image/object/bbox/ymax", "float", empty_f) * h
        boxes = np.stack([xmin, ymin, xmax, ymax], axis=1).astype(np.float32) \
            if len(xmin) else np.zeros((0, 4), np.float32)
        empty_i = np.zeros(0, np.int64)
        sample = {
            "image": img,
            "image_id": int(
                self._feature(f, "image/source_id", "bytes", [b"0"])[0]
            ),
            "boxes": boxes,
            "classes": np.asarray(
                self._feature(f, "image/object/class/label", "int64", empty_i),
                np.int32,
            ),
            "is_crowd": np.asarray(
                self._feature(f, "image/object/is_crowd", "int64", empty_i),
                bool,
            ),
        }
        areas = self._feature(f, "image/object/area", "float", empty_f)
        if len(areas):
            sample["areas"] = np.asarray(areas, np.float32)
        if self.load_masks:
            masks = [
                cv2.imdecode(np.frombuffer(m, np.uint8), cv2.IMREAD_GRAYSCALE)
                for m in self._feature(f, "image/object/mask", "bytes", [])
            ]
            sample["masks"] = (
                np.stack(masks).astype(np.float32)
                if masks
                else np.zeros((0, h, w), np.float32)
            )
        sem = self._feature(f, "image/sem_seg", "bytes", [])
        if len(sem):
            from .panoptic import rgb_to_id

            rgb = cv2.imdecode(np.frombuffer(sem[0], np.uint8), cv2.IMREAD_COLOR)
            ids = rgb_to_id(cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB))
            sample["sem_seg"] = np.where(
                ids == 256**3 - 1, -1, ids
            ).astype(np.int32)
        return sample

    def image_id(self, idx: int) -> int:
        """Decode only sample ``idx``'s id (eval indexes GT by image_id)."""
        fi, off, length = self._index[idx]
        payload = codec.read_record_at(self.files[fi], off, length, verify=True)
        f = codec.decode_example(payload)
        return int(self._feature(f, "image/source_id", "bytes", [b"0"])[0])
