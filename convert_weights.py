#!/usr/bin/env python
"""Foreign-weights conversion entry point (reference: convert_weights.py).

Converts a Detectron2 pickle / torch checkpoint into an Orbax checkpoint of
this framework's variables (PRETRAINS.DETECTRON2 -> PRETRAINS.WEIGHTS).
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", required=True)
    p.add_argument("--source", default=None, help="override PRETRAINS.DETECTRON2")
    p.add_argument("--output", default=None, help="override PRETRAINS.WEIGHTS")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.config.finalize import finalize
    from detectron2_tensorflow_tpu.convert.d2 import (
        apply_converted,
        convert_d2_weights,
        load_state_dict,
    )
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    finalize(cfg, training=False)

    dst = args.output or os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.WEIGHTS)

    model = build_model(cfg)
    sample = {
        "image": jnp.zeros((1, 128, 128, 3), jnp.float32),
        "image_size": jnp.asarray([[128, 128]], jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)

    # Dispatch on the configured source format (reference: one converter per
    # PRETRAINS key — convert_d2 / convert_backbone / convert_solo /
    # convert_yolov4).
    if args.source or cfg.PRETRAINS.DETECTRON2:
        src = args.source or os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.DETECTRON2)
        sd = load_state_dict(src)
        converted, leftovers = convert_d2_weights(sd, cfg)
    elif cfg.PRETRAINS.MMDET:
        from detectron2_tensorflow_tpu.convert.solo import convert_solo_weights

        src = os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.MMDET)
        converted, leftovers = convert_solo_weights(load_state_dict(src), cfg)
    elif cfg.PRETRAINS.DARKNET:
        from detectron2_tensorflow_tpu.convert.darknet import (
            convert_darknet_weights,
            read_darknet_blob,
        )

        src = os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.DARKNET)
        with open(src + ".json") as f:
            import json

            manifest = json.load(f)
        converted, consumed = convert_darknet_weights(
            read_darknet_blob(src), manifest
        )
        leftovers = []
    elif cfg.PRETRAINS.BACKBONE:
        src = os.path.join(cfg.PRETRAINS.ROOT, cfg.PRETRAINS.BACKBONE)
        if src.endswith(".pkl"):
            from detectron2_tensorflow_tpu.convert.backbone import (
                convert_caffe2_backbone,
                load_caffe2_pickle,
            )

            converted, leftovers = convert_caffe2_backbone(load_caffe2_pickle(src))
        else:
            from detectron2_tensorflow_tpu.convert.torchvision import (
                convert_torchvision_backbone,
            )

            converted, leftovers = convert_torchvision_backbone(load_state_dict(src))
    else:
        raise SystemExit("no PRETRAINS source configured")
    if leftovers:
        logging.warning("unconverted keys: %s", leftovers)
    variables = apply_converted(variables, converted)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(dst), jax.device_get(variables), force=True)
    ckptr.wait_until_finished()
    print(f"saved converted checkpoint to {dst}")


if __name__ == "__main__":
    main()
