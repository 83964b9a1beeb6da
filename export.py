#!/usr/bin/env python
"""Serving-export entry point (reference: /root/reference/export.py).

Produces <out>/checkpoint (Orbax), model.stablehlo, saved_model/ (if tf
available), label_index.map and model_info.json.
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--serving_height", type=int, default=800)
    p.add_argument("--serving_width", type=int, default=1344)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize
    from detectron2_tensorflow_tpu.export.export import export
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    finalize(cfg, training=False)

    model = build_model(cfg)
    h, w = args.serving_height, args.serving_width
    sample = {
        "image": jnp.zeros((1, h, w, 3), jnp.float32),
        "image_size": jnp.asarray([[h, w]], jnp.int32),
    }
    from eval import load_variables  # shared checkpoint/convert logic

    ckpt = args.checkpoint or os.path.join(
        cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR, cfg.LOGS.TRAIN
    )
    variables = load_variables(cfg, model, sample, ckpt)

    out_dir = args.output_dir or os.path.join(
        cfg.LOGS.ROOT_DIR or cfg.OUTPUT_DIR, cfg.LOGS.EXPORT
    )
    artifacts = export(cfg, model, variables, out_dir, (h, w))
    for k, v in artifacts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
