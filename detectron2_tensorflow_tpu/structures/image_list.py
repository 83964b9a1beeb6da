"""ImageList: a batch of images padded to one static shape.

The reference pads each batch to the dynamic per-batch max plus
size-divisibility (/root/reference/lib/structures/image_list.py:7-101). Under
jit we pad to a *configured static bucket* instead so the graph compiles once
per bucket; the true pre-padding sizes ride along for box clipping, mask
pasting and result un-scaling.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class ImageList:
    """``tensor``: [B, H, W, C] padded images; ``image_sizes``: [B, 2] (h, w)."""

    def __init__(self, tensor: jnp.ndarray, image_sizes: jnp.ndarray):
        self.tensor = tensor
        self.image_sizes = image_sizes

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    @staticmethod
    def from_tensors(
        tensors: Sequence[jnp.ndarray],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        pad_to: Tuple[int, int] | None = None,
    ) -> "ImageList":
        """Pad a list of [Hi, Wi, C] images to a common static shape.

        ``pad_to`` fixes the output bucket; otherwise the max size (rounded up
        to ``size_divisibility``) is used. Intended for host-side batching —
        inside jit, images already arrive as one padded tensor.
        """
        assert len(tensors) > 0
        image_sizes = np.array([[t.shape[0], t.shape[1]] for t in tensors], np.int32)
        if pad_to is not None:
            max_h, max_w = pad_to
        else:
            max_h = int(image_sizes[:, 0].max())
            max_w = int(image_sizes[:, 1].max())
        if size_divisibility > 0:
            d = size_divisibility
            max_h = -(-max_h // d) * d
            max_w = -(-max_w // d) * d
        batch = []
        for t in tensors:
            pad_h = max_h - t.shape[0]
            pad_w = max_w - t.shape[1]
            assert pad_h >= 0 and pad_w >= 0, (
                f"image {t.shape} larger than bucket {(max_h, max_w)}"
            )
            batch.append(
                jnp.pad(
                    t,
                    ((0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=pad_value,
                )
            )
        return ImageList(jnp.stack(batch), jnp.asarray(image_sizes))
