import jax
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.structures import (
    ImageList,
    Instances,
    crop_and_resize_masks,
    paste_masks_in_image,
)


def _make_instances(n=8, valid=5):
    return Instances(
        image_size=(100, 200),
        boxes=jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4),
        scores=jnp.arange(n, dtype=jnp.float32),
        is_valid=jnp.arange(n) < valid,
    )


def test_instances_pytree_roundtrip():
    inst = _make_instances()
    leaves, treedef = jax.tree_util.tree_flatten(inst)
    inst2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert inst2.image_size == (100, 200)
    np.testing.assert_array_equal(inst2.boxes, inst.boxes)
    assert int(inst.num_valid()) == 5


def test_instances_through_jit():
    inst = _make_instances()

    @jax.jit
    def f(i: Instances):
        return i.replace(scores=i.scores * 2)

    out = f(inst)
    np.testing.assert_allclose(out.scores, np.arange(8) * 2)


def test_instances_gather():
    inst = _make_instances(n=8, valid=5)
    idx = jnp.array([4, 6, 0])
    picked = inst.gather(idx, valid=jnp.array([True, True, True]))
    np.testing.assert_allclose(picked.scores, [4, 6, 0])
    # row 6 was invalid in the source -> stays invalid after AND
    np.testing.assert_array_equal(picked.is_valid, [True, False, True])


def test_image_list_padding():
    imgs = [jnp.ones((37, 51, 3)), jnp.ones((64, 48, 3))]
    il = ImageList.from_tensors(imgs, size_divisibility=32)
    assert il.tensor.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(il.image_sizes, [[37, 51], [64, 48]])
    # padding area must be zero
    assert float(il.tensor[0, 37:, :, :].sum()) == 0.0


def test_image_list_bucket():
    imgs = [jnp.ones((37, 51, 3))]
    il = ImageList.from_tensors(imgs, pad_to=(128, 128))
    assert il.tensor.shape == (1, 128, 128, 3)


def test_paste_masks_full_box_identity_like():
    # A constant-1 mask pasted into its own box covers exactly the box region.
    mask = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.array([[8.0, 4.0, 40.0, 36.0]])
    out = paste_masks_in_image(mask, boxes, (64, 64), threshold=0.5)
    out = np.asarray(out[0])
    # Interior of the box is fully covered.
    assert out[5:35, 9:39].all()
    # Far outside the box there is nothing.
    assert not out[:3, :].any() and not out[:, 42:].any()


def test_paste_crop_roundtrip():
    # Crop a GT mask to its box then paste it back: should approximately
    # recover the original inside the box.
    rng = np.random.default_rng(0)
    gt = np.zeros((1, 64, 64), np.float32)
    gt[0, 16:48, 20:44] = 1.0
    box = jnp.array([[20.0, 16.0, 44.0, 48.0]])
    crop = crop_and_resize_masks(jnp.asarray(gt), box, 28)
    assert crop.shape == (1, 28, 28)
    assert float(crop.mean()) > 0.9  # box exactly covers the blob
    pasted = paste_masks_in_image(crop, box, (64, 64), threshold=0.5)
    iou = (
        np.logical_and(pasted[0], gt[0] > 0.5).sum()
        / np.logical_or(pasted[0], gt[0] > 0.5).sum()
    )
    assert iou > 0.9


def test_paste_masks_soft_output():
    mask = jnp.full((2, 14, 14), 0.4, jnp.float32)
    boxes = jnp.array([[4.0, 4.0, 24.0, 24.0], [0.0, 0.0, 10.0, 10.0]])
    soft = paste_masks_in_image(mask, boxes, (32, 32), threshold=-1.0)
    assert soft.dtype == jnp.float32
    assert float(soft.max()) <= 0.4 + 1e-5
