"""Fast R-CNN: ROI heads over PRECOMPUTED proposals (MODEL.LOAD_PROPOSALS).

The reference defines the key (defaults.py:68) and ships quick_schedules for
the arch but never consumes it in lib/; implemented here end to end:
proposal files -> transforms -> fixed-slot packing -> RPN-less model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.data import build_dataloader
from detectron2_tensorflow_tpu.engine import build_train_step, create_train_state
from detectron2_tensorflow_tpu.models import build_model
from tests.test_data import SyntheticDataset
from tests.test_end_to_end import tiny_rcnn_cfg

pytestmark = pytest.mark.slow  # full-detector jit compiles


class ProposalDataset(SyntheticDataset):
    """Synthetic detection data + jittered-GT precomputed proposals."""

    def __getitem__(self, idx):
        s = dict(self.samples[idx])
        rng = np.random.default_rng(idx + 100)
        boxes = s["boxes"]
        jitter = rng.normal(0, 2.0, (len(boxes) * 8, 4)).astype(np.float32)
        props = np.repeat(boxes, 8, axis=0) + jitter
        props = np.clip(props, 0, [self.w, self.h, self.w, self.h])
        s["proposals"] = props.astype(np.float32)
        s["proposal_scores"] = rng.uniform(0, 10, len(props)).astype(np.float32)
        return s


def _cfg():
    cfg = tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 16
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 16
    return cfg


def test_fast_rcnn_train_and_predict():
    cfg = _cfg()
    ds = ProposalDataset(n=4, num_classes=3, with_masks=False)
    model = build_model(cfg)

    # The model must have NO RPN parameters.
    train_iter = build_dataloader(cfg, ds, training=True, seed=0)
    first = {k: jnp.asarray(v) for k, v in next(train_iter).items()}
    assert "proposal_boxes" in first and first["proposal_boxes"].shape[1] == 16
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), first)
    names = str(jax.tree_util.tree_structure(state.params))
    assert "rpn" not in names.lower()

    step = build_train_step(cfg, model, state.params)
    losses = []
    batch = first
    for i in range(3):
        state, metrics = step(state, batch)
        assert "loss_rpn_cls" not in metrics
        losses.append(float(metrics["total_loss"]))
        batch = {k: jnp.asarray(v) for k, v in next(train_iter).items()}
    assert all(np.isfinite(l) for l in losses), losses

    # Inference consumes the same proposal slots.
    variables = {"params": state.params, **state.model_state}
    eval_iter = build_dataloader(cfg, ds, training=False, seed=0)
    eb = {k: jnp.asarray(v) for k, v in next(eval_iter).items()}
    out = jax.jit(model.predict)(variables, eb)
    assert out.boxes.shape[-1] == 4
    assert np.isfinite(np.asarray(out.scores)).all()


def test_proposal_file_roundtrip(tmp_path):
    """CocoDataset.set_proposals reads the D2 pickle format."""
    import pickle

    data = {
        "ids": [0, 1],
        "boxes": [np.array([[1.0, 2.0, 30.0, 40.0]]), np.zeros((0, 4))],
        "objectness_logits": [np.array([3.2]), np.zeros(0)],
    }
    path = tmp_path / "props.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)

    class FakeCoco:
        pass

    from detectron2_tensorflow_tpu.data.coco import CocoDataset

    ds = FakeCoco()
    CocoDataset.set_proposals(ds, str(path))
    pb, ps = ds._proposals[0]
    np.testing.assert_allclose(pb, [[1, 2, 30, 40]])
    np.testing.assert_allclose(ps, [3.2])
    assert ds._proposals[1][0].shape == (0, 4)
