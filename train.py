#!/usr/bin/env python
"""Training entry point (reference: /root/reference/train.py).

Usage:
    python train.py --config_file configs/my.yaml [KEY VALUE ...]

Expects a COCO-format dataset: ``<DATASETS.ROOT_DIR>/<DATASETS.TRAIN>.json``
annotations and ``<DATASETS.ROOT_DIR>/<DATASETS.TRAIN>/`` images.
"""

from __future__ import annotations

import argparse
import logging
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("--max_iter", type=int, default=None, help="override MAX_ITER")
    p.add_argument("opts", nargs=argparse.REMAINDER, help="KEY VALUE overrides")
    return p.parse_args()


def build_train_dataset(cfg):
    """Training input per DATASETS.TRAIN_FORMAT: TFRecord shards (the
    reference's only input path, lib/data/dataloader.py:69-112) or COCO
    JSON. "auto" prefers `<ROOT>/<TRAIN>.record-*` shards when present —
    keypoint and precomputed-proposal fields live only in the JSON path."""
    import glob

    from detectron2_tensorflow_tpu.data import CocoDataset

    pattern = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN + ".record-*")
    fmt = cfg.DATASETS.TRAIN_FORMAT
    needs_sem_seg = cfg.MODEL.META_ARCHITECTURE in (
        "PanopticFPN", "SemanticSegmentor"
    )
    json_only = cfg.MODEL.KEYPOINT_ON or (
        cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TRAIN
    )
    if fmt == "records" or (fmt == "auto" and glob.glob(pattern) and not json_only):
        from detectron2_tensorflow_tpu.data.records import TFRecordDataset

        logging.info("training from records: %s", pattern)
        ds = TFRecordDataset(pattern, load_masks=cfg.MODEL.MASK_ON)
        if needs_sem_seg:
            sample = ds[0]
            if sample.get("sem_seg") is None:
                raise ValueError(
                    f"{cfg.MODEL.META_ARCHITECTURE} needs semantic GT but the "
                    f"records at {pattern} carry none — rebuild them with "
                    "BUILD_RECORDS.TYPE coco_pano (build_records.py)"
                )
        return ds

    if needs_sem_seg:
        # Semantic/panoptic GT comes from the COCO-panoptic layout:
        # <TRAIN>_panoptic.json + <TRAIN>_panoptic/ PNG id-maps
        # (reference build_coco_pano.py:33-265 reads the same files).
        from detectron2_tensorflow_tpu.data.panoptic import CocoPanopticDataset

        return CocoPanopticDataset(
            os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN + "_panoptic.json"),
            os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN + "_panoptic"),
            os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN),
            ignore_label=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        )

    ann = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN + ".json")
    img_root = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.TRAIN)
    dataset = CocoDataset(
        ann, img_root, load_masks=cfg.MODEL.MASK_ON,
        min_keypoints=(
            cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE
            if cfg.MODEL.KEYPOINT_ON
            else 0
        ),
    )
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TRAIN:
        dataset.set_proposals(
            os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.PROPOSAL_FILES_TRAIN[0])
        )
    return dataset


def main():
    logging.basicConfig(level=logging.INFO)
    args = parse_args()

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize
    from detectron2_tensorflow_tpu.data import CocoDataset, build_dataloader
    from detectron2_tensorflow_tpu.engine import train
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    # Multi-host: join the cluster BEFORE any jax call initializes the
    # backend (finalize() below queries jax.device_count()).
    from detectron2_tensorflow_tpu.parallel import initialize_multihost

    multihost = initialize_multihost(cfg)

    finalize(cfg, training=True)

    dataset = build_train_dataset(cfg)

    model = build_model(cfg)
    from detectron2_tensorflow_tpu.data import (
        build_native_train_loader,
        native_train_loader_usable,
    )

    # Multi-host: each process loads 1/process_count of the global batch
    # with a disjoint shuffle stream; parallel.shard_batch assembles the
    # slices into the global array inside the train loop.
    import jax

    local_batch = cfg.SOLVER.IMS_PER_BATCH // jax.process_count()
    loader_seed = max(cfg.SEED, 0) + 7919 * jax.process_index()
    if cfg.DATALOADER.NATIVE_TRAIN_IO and native_train_loader_usable(
        cfg, dataset
    ):
        data_iter = build_native_train_loader(
            cfg, dataset, batch_size=local_batch, seed=loader_seed
        )
    else:
        data_iter = build_dataloader(
            cfg, dataset, training=True, batch_size=local_batch,
            seed=loader_seed,
        )

    # Periodic in-training evaluation (TEST.EVAL_PERIOD; reference
    # evaluator.py:80-87 runs it as a separate polling job — here it can also
    # run inline on the training host).
    eval_fn = None
    if cfg.TEST.EVAL_PERIOD > 0 and jax.process_index() == 0:
        import jax.numpy as jnp

        from detectron2_tensorflow_tpu.engine.evaluator import run_evaluation

        val_ann = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.VAL + ".json")
        val_root = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.VAL)
        val_ds = CocoDataset(val_ann, val_root, load_masks=cfg.MODEL.MASK_ON)

        def eval_fn(variables, step):
            batches = build_dataloader(cfg, val_ds, training=False)
            it = ({k: jnp.asarray(v) for k, v in b.items()} for b in batches)
            return run_evaluation(
                cfg, model, variables, val_ds, it,
                max_images=cfg.EVAL.NUM_EVAL or None,
            )

    ckpt_dir = os.path.join(cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR, cfg.LOGS.TRAIN)
    train(
        cfg, model, data_iter,
        max_iter=args.max_iter, checkpoint_dir=ckpt_dir, eval_fn=eval_fn,
    )


if __name__ == "__main__":
    main()
