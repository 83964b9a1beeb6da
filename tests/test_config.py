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
    import glob

    files = [
        f
        for f in glob.glob("/root/reference/configs/**/*.yaml", recursive=True)
        if "quick_schedules" not in f and "PascalVOC" not in f
    ]
    if not files:
        pytest.skip("reference configs not mounted")
    for f in files:
        cfg = get_cfg()
        cfg.merge_from_file(f)
