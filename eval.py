#!/usr/bin/env python
"""Evaluation entry point (reference: /root/reference/eval.py).

Loads the latest checkpoint from the training dir (or PRETRAINS.WEIGHTS /
PRETRAINS.DETECTRON2), runs COCO evaluation, checks TEST.EXPECTED_RESULTS.
"""

from __future__ import annotations

import argparse
import logging
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("--checkpoint", default=None, help="explicit checkpoint path")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def load_variables(cfg, model, sample_batch, checkpoint):
    import jax

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample_batch)
    if checkpoint and os.path.isdir(checkpoint):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(checkpoint))
        if "params" in restored and "model_state" in restored:
            # Training-loop checkpoint ({params, model_state, opt_state, ...}).
            return {"params": restored["params"], **restored["model_state"]}
        return restored  # plain variables checkpoint (convert_weights/export)
    if cfg.PRETRAINS.DETECTRON2:
        from detectron2_tensorflow_tpu.convert.d2 import (
            apply_converted,
            convert_d2_weights,
            load_state_dict,
        )

        sd = load_state_dict(
            os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.DETECTRON2)
        )
        converted, leftovers = convert_d2_weights(sd, cfg)
        if leftovers:
            logging.warning("unconverted checkpoint keys: %s", leftovers)
        return apply_converted(variables, converted)
    logging.warning("no checkpoint found — evaluating random weights")
    return variables


def main():
    logging.basicConfig(level=logging.INFO)
    args = parse_args()

    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize
    from detectron2_tensorflow_tpu.data import CocoDataset, build_dataloader
    from detectron2_tensorflow_tpu.engine import check_expected_results, evaluate
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    finalize(cfg, training=False)

    ann = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.VAL + ".json")
    img_root = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.VAL)
    dataset = CocoDataset(ann, img_root, load_masks=cfg.MODEL.MASK_ON)

    model = build_model(cfg)
    eval_iter = build_dataloader(cfg, dataset, training=False)
    eval_iter = ({k: jnp.asarray(v) for k, v in b.items()} for b in eval_iter)
    first = next(eval_iter)

    ckpt = args.checkpoint or os.path.join(
        cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR, cfg.LOGS.TRAIN
    )
    variables = load_variables(cfg, model, first, ckpt)

    def chain():
        yield first
        yield from eval_iter

    metrics = evaluate(cfg, model, variables, dataset, chain(), args.max_images)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.3f}")
    failures = check_expected_results(cfg, metrics)
    if failures:
        raise SystemExit("EXPECTED_RESULTS failed:\n" + "\n".join(failures))


if __name__ == "__main__":
    main()
