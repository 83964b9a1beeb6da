"""Config finalization: derived keys + freeze.

Equivalent of the reference's config_utils.finalize (/root/reference/lib/
utils/config_utils.py:7-21) minus the process-global training flag (training
mode is explicit per call in this framework). Derives device counts and
class counts (from category_map.json when present), then freezes.
"""

from __future__ import annotations

import json
import os


def finalize(cfg, training: bool = True):
    import jax

    num_devices = max(jax.device_count(), 1)
    if not cfg.is_frozen():
        cfg.SOLVER.NUM_GPUS = num_devices  # reference name; means devices here
        cfg.SOLVER.IMS_PER_BATCH = cfg.SOLVER.IMS_PER_GPU * num_devices

        # Static pad buckets stand in for the reference's dynamic
        # size-divisibility padding (image_list.py:89-99): every bucket must
        # itself satisfy INPUT.SIZE_DIVISIBILITY or backbone strides would
        # produce misaligned feature shapes.
        d = cfg.INPUT.SIZE_DIVISIBILITY
        if d > 1:
            for bh, bw in cfg.INPUT.PAD_BUCKETS:
                if bh % d or bw % d:
                    raise ValueError(
                        f"INPUT.PAD_BUCKETS entry ({bh}, {bw}) is not "
                        f"divisible by INPUT.SIZE_DIVISIBILITY={d}"
                    )

        cat_map = os.path.join(cfg.DATASETS.ROOT_DIR, cfg.DATASETS.CATEGORY_MAP_NAME)
        if os.path.isfile(cat_map):
            with open(cat_map) as f:
                cats = json.load(f)
            if "thing_classes" in cats:
                n = len(cats["thing_classes"])
                cfg.MODEL.ROI_HEADS.NUM_CLASSES = n
                cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = n
            if "stuff_classes" in cats:
                cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = len(cats["stuff_classes"])
        cfg.freeze()

    # Persistent XLA compilation cache: the jitted detector graphs take
    # 20-40s each to compile on TPU; caching them on disk makes restarts,
    # resume-after-preemption and eval-after-train near-instant. Harmless
    # if several processes share the directory (entries are content-hashed).
    if cfg.LOGS.COMPILATION_CACHE_DIR:
        path = os.path.expanduser(cfg.LOGS.COMPILATION_CACHE_DIR)
        try:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except (OSError, AttributeError):
            pass  # read-only FS or an older jax without the knob
    return cfg
