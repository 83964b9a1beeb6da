#!/usr/bin/env python
"""Evaluation entry point (reference: /root/reference/eval.py).

Loads the latest checkpoint from the training dir (or PRETRAINS.WEIGHTS /
PRETRAINS.DETECTRON2), runs the evaluators selected by EVAL.METRICS
(detection / instance-seg / keypoints / VOC / semantic-seg / panoptic),
and checks TEST.EXPECTED_RESULTS.

``--watch N`` polls the checkpoint directory every N seconds and evaluates
each new step as it appears (the reference's slim evaluation_loop,
lib/engine/evaluator.py:80-87), exiting after ``--watch_timeout`` idle
seconds.
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("--checkpoint", default=None, help="explicit checkpoint path")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument(
        "--dump_results", default=None,
        help="write detections as a COCO results JSON (pycocotools-ready)",
    )
    p.add_argument(
        "--watch", type=int, default=0,
        help="poll interval (s) for continuous evaluation of new checkpoints",
    )
    p.add_argument(
        "--watch_timeout", type=int, default=3600,
        help="stop watching after this many seconds without a new checkpoint",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def load_variables(cfg, model, sample_batch, checkpoint):
    """Init the model, then restore from an Orbax dir or PRETRAINS source."""
    import jax

    from detectron2_tensorflow_tpu.engine.checkpoint import (
        latest_checkpoint,
        load_pretrained,
        restore_variables,
    )

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample_batch)
    if checkpoint and os.path.isdir(checkpoint):
        # A CheckpointManager dir (step subdirs) or a direct step/variables dir.
        step_dir = latest_checkpoint(checkpoint) or checkpoint
        logging.info("restoring %s", step_dir)
        return restore_variables(step_dir, variables)
    loaded = load_pretrained(cfg, model, variables)
    if loaded is variables:
        logging.warning("no checkpoint found — evaluating random weights")
    return loaded


def build_eval_dataset(cfg):
    """Dataset keyed by the evaluation families in EVAL.METRICS: panoptic /
    semantic metrics need the panoptic GT; detection uses CocoDataset."""
    from detectron2_tensorflow_tpu.data import CocoDataset

    names = tuple(cfg.EVAL.METRICS)
    root = cfg.DATASETS.ROOT_DIR
    if ("panoptic_segmentation_metrics" in names
            or "semantic_segmentation_metrics" in names):
        from detectron2_tensorflow_tpu.data.panoptic import CocoPanopticDataset

        return CocoPanopticDataset(
            os.path.join(root, cfg.DATASETS.VAL + "_panoptic.json"),
            os.path.join(root, cfg.DATASETS.VAL + "_panoptic"),
            os.path.join(root, cfg.DATASETS.VAL),
        )
    # Detection family: records when present (the reference's only eval
    # input, lib/engine/evaluator.py:16-53), else COCO JSON — same
    # DATASETS.TRAIN_FORMAT rule as train.py. Proposal files need the
    # JSON path (ids are keyed to the annotations file).
    import glob

    pattern = os.path.join(root, cfg.DATASETS.VAL + ".record-*")
    json_only = cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST
    fmt = cfg.DATASETS.TRAIN_FORMAT
    if fmt == "records" or (fmt == "auto" and glob.glob(pattern) and not json_only):
        from detectron2_tensorflow_tpu.data.records import TFRecordDataset

        logging.info("evaluating from records: %s", pattern)
        return TFRecordDataset(pattern, load_masks=cfg.MODEL.MASK_ON)

    ann = os.path.join(root, cfg.DATASETS.VAL + ".json")
    img_root = os.path.join(root, cfg.DATASETS.VAL)
    ds = CocoDataset(ann, img_root, load_masks=cfg.MODEL.MASK_ON)
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST:
        ds.set_proposals(
            os.path.join(root, cfg.DATASETS.PROPOSAL_FILES_TEST[0])
        )
    return ds


def main():
    logging.basicConfig(level=logging.INFO)
    args = parse_args()

    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize
    from detectron2_tensorflow_tpu.data import build_dataloader
    from detectron2_tensorflow_tpu.engine import check_expected_results
    from detectron2_tensorflow_tpu.engine.evaluator import run_evaluation
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    finalize(cfg, training=False)

    dataset = build_eval_dataset(cfg)
    model = build_model(cfg)

    def data_iter():
        from detectron2_tensorflow_tpu.data import (
            build_native_eval_loader,
            native_eval_loader_usable,
        )

        if cfg.DATALOADER.NATIVE_EVAL_IO and native_eval_loader_usable(
            cfg, dataset
        ):
            batches = build_native_eval_loader(cfg, dataset)
        else:
            batches = build_dataloader(cfg, dataset, training=False)
        return ({k: jnp.asarray(v) for k, v in b.items()} for b in batches)

    sample = next(data_iter())
    ckpt = args.checkpoint or os.path.join(
        cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR, cfg.LOGS.TRAIN
    )

    def eval_once():
        variables = load_variables(cfg, model, sample, ckpt)
        if cfg.TEST.PRECISE_BN.ENABLED:
            # Re-estimate BatchNorm statistics over NUM_ITER batches before
            # evaluating (TEST.PRECISE_BN — config-only in the reference).
            import itertools

            from detectron2_tensorflow_tpu.engine.tta import precise_bn

            n = cfg.TEST.PRECISE_BN.NUM_ITER
            variables = precise_bn(
                model, variables, itertools.islice(data_iter(), n),
                num_iters=n,
            )
        writer = None
        if args.dump_results:
            from detectron2_tensorflow_tpu.evaluation.coco_results import (
                CocoResultsWriter,
            )

            writer = CocoResultsWriter(
                getattr(dataset, "contiguous_to_cat_id", None)
            )
        metrics = run_evaluation(
            cfg, model, variables, dataset, data_iter, args.max_images,
            results_writer=writer,
        )
        if writer is not None:
            n = writer.save(args.dump_results)
            logging.info("wrote %d records to %s", n, args.dump_results)
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v:.3f}")
        return metrics

    if args.watch <= 0:
        metrics = eval_once()
        failures = check_expected_results(cfg, metrics)
        if failures:
            raise SystemExit("EXPECTED_RESULTS failed:\n" + "\n".join(failures))
        return

    # Continuous mode: evaluate each new checkpoint step as it lands.
    from detectron2_tensorflow_tpu.engine.checkpoint import latest_step

    last_seen = None
    idle_since = time.time()
    while True:
        step = latest_step(ckpt)
        if step is not None and step != last_seen:
            logging.info("evaluating checkpoint step %d", step)
            metrics = eval_once()
            last_seen = step
            idle_since = time.time()
            out_dir = cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR
            if out_dir:
                import json

                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, "eval_metrics.jsonl"), "a") as f:
                    f.write(json.dumps({"step": step, **metrics}) + "\n")
        if time.time() - idle_since > args.watch_timeout:
            logging.info("no new checkpoint for %ds — stopping", args.watch_timeout)
            break
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
