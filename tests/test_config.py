import os

import pytest

from detectron2_tensorflow_tpu.config import CfgNode, get_cfg


def test_defaults_load_and_clone():
    cfg = get_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert cfg.MODEL.RESNETS.DEPTH == 101
    cfg2 = get_cfg()
    cfg2.MODEL.RESNETS.DEPTH = 50
    assert cfg.MODEL.RESNETS.DEPTH == 101  # clones are independent


def test_freeze_blocks_mutation():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.MASK_ON = False
    # COMPUTED_ keys are insert-only even when frozen.
    cfg.COMPUTED_NUM_CLASSES = 80
    assert cfg.COMPUTED_NUM_CLASSES == 80
    with pytest.raises(KeyError):
        cfg.COMPUTED_NUM_CLASSES = 81


def test_merge_from_list_type_checks():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.RESNETS.DEPTH", "50", "MODEL.MASK_ON", "False"])
    assert cfg.MODEL.RESNETS.DEPTH == 50
    assert cfg.MODEL.MASK_ON is False
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])
    with pytest.raises(ValueError):
        cfg.merge_from_list(["MODEL.RESNETS.DEPTH", "'a string'"])


def test_merge_rejects_unknown_keys():
    cfg = get_cfg()
    bad = CfgNode({"MODEL": {"TYPO_KEY": 1}})
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg(bad)


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  MASK_ON: false\n  RESNETS:\n    DEPTH: 50\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f'_BASE_: "{base}"\nMODEL:\n  RESNETS:\n    DEPTH: 101\n'
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.MASK_ON is False  # from base
    assert cfg.MODEL.RESNETS.DEPTH == 101  # overridden by child


def test_tuple_list_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["TRANSFORM.RESIZE.MIN_SIZE_TRAIN", "(640, 672, 704)"])
    assert tuple(cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN) == (640, 672, 704)


def test_restricted_eval_tag(tmp_path):
    # Reference RetinaNet configs compute anchor sizes with the yaml eval tag.
    f = tmp_path / "evaltag.yaml"
    f.write_text(
        "MODEL:\n  ANCHOR_GENERATOR:\n"
        '    SIZES: !!python/object/apply:eval ["[[x, x * 2] for x in [32, 64]]"]\n'
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.ANCHOR_GENERATOR.SIZES == [[32, 64], [64, 128]]


def test_eval_tag_cannot_reach_builtins(tmp_path):
    f = tmp_path / "evil.yaml"
    f.write_text(
        'SEED: !!python/object/apply:eval ["__import__(\'os\').getpid()"]\n'
    )
    cfg = get_cfg()
    with pytest.raises(Exception):
        cfg.merge_from_file(str(f))


def test_reference_configs_merge():
    """EVERY reference YAML merges (quick_schedules and PascalVOC included —
    the upstream-D2 key-alias shim handles their MODEL.WEIGHTS /
    INPUT.MIN_SIZE_* / tuple-DATASETS spellings), except files whose _BASE_
    is missing from the reference checkout itself."""
    import glob
    import os

    files = sorted(glob.glob("/root/reference/configs/**/*.yaml", recursive=True))
    if not files:
        pytest.skip("reference configs not mounted")
    n_ok, missing_base = 0, 0
    for f in files:
        cfg = get_cfg()
        try:
            cfg.merge_from_file(f)
            n_ok += 1
        except FileNotFoundError:
            missing_base += 1  # the reference itself can't load these
    assert missing_base <= 3, missing_base
    assert n_ok >= 68, n_ok


def test_all_local_configs_merge_and_misc_build():
    """Every YAML this repo ships merges cleanly, and every Misc config
    (the round-3 ports of /root/reference/configs/Misc/) builds its model —
    except cascade_lcc, whose `CascadeLCCHeads` is registered nowhere in
    the reference's lib/ either (documented vestige, like SpineNet): it
    must merge but raise a clear error at build."""
    import glob

    from detectron2_tensorflow_tpu.models import build_model

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "configs", "**", "*.yaml"),
                             recursive=True))
    assert len(files) >= 70, len(files)
    misc_built = 0
    for f in files:
        cfg = get_cfg()
        cfg.merge_from_file(f)  # must not raise
        if os.sep + "Misc" + os.sep not in f:
            continue
        if "cascade_lcc" in f:
            with pytest.raises(Exception, match="CascadeLCC"):
                build_model(cfg)
        else:
            build_model(cfg)
            misc_built += 1
    assert misc_built >= 10, misc_built


def test_upstream_alias_shim(tmp_path):
    y = tmp_path / "d2.yaml"
    y.write_text(
        'MODEL:\n'
        '  WEIGHTS: "detectron2://COCO/mask_rcnn/137849600/model_final.pkl"\n'
        'INPUT:\n'
        '  MIN_SIZE_TRAIN: (600,)\n'
        '  MAX_SIZE_TEST: 1000\n'
        'DATASETS:\n'
        '  TRAIN: ("coco_2017_val",)\n'
        '  TEST: ("coco_2017_val_100",)\n'
        'DATALOADER:\n'
        '  NUM_WORKERS: 2\n'
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(y))
    assert cfg.PRETRAINS.DETECTRON2 == "COCO/mask_rcnn/137849600/model_final.pkl"
    assert cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN == (600,)
    assert cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST == 1000
    assert cfg.DATASETS.TRAIN == "coco_2017_val"
    assert cfg.DATASETS.VAL == "coco_2017_val_100"
    assert cfg.DATALOADER.NUM_READERS == 2

    # ImageNet pickles route to the backbone converter slot.
    y2 = tmp_path / "bb.yaml"
    y2.write_text('MODEL:\n  WEIGHTS: "detectron2://ImageNetPretrained/MSRA/R-50.pkl"\n')
    cfg = get_cfg()
    cfg.merge_from_file(str(y2))
    assert cfg.PRETRAINS.BACKBONE == "ImageNetPretrained/MSRA/R-50.pkl"
    assert cfg.PRETRAINS.DETECTRON2 == ""


def test_all_quick_schedules_merge_and_build():
    """All 22 ported quick_schedules merge; one per meta-arch family also
    builds its model (the SURVEY §4 regression-harness surface)."""
    import glob

    from detectron2_tensorflow_tpu.models import build_model

    files = sorted(glob.glob("/root/repo/configs/quick_schedules/*.yaml"))
    assert len(files) >= 21, files
    build_one_of = {
        "mask_rcnn_R_50_FPN_instant_test",
        "mask_rcnn_R_50_C4_instant_test",
        "rpn_R_50_FPN_instant_test",
        "panoptic_fpn_R_50_instant_test",
        "semantic_R_50_FPN_instant_test",
        "keypoint_rcnn_R_50_FPN_instant_test",
        "fast_rcnn_R_50_FPN_instant_test",
    }
    built = 0
    for f in files:
        cfg = get_cfg()
        cfg.merge_from_file(f)
        name = f.split("/")[-1].removesuffix(".yaml")
        if name in build_one_of:
            build_model(cfg)
            built += 1
    assert built == len(build_one_of)
