"""Instances: a fixed-capacity, mask-validated container of per-object fields.

Replaces the reference's BoxList + SparseBoxList pair
(/root/reference/lib/structures/box_list.py:7-264). The reference's ragged
SparseBoxList exists only to round-trip through dense padded tensors; under
XLA everything is dense anyway, so Instances *is* the dense representation:

  * every field is an array with leading dim ``capacity`` (static),
  * ``is_valid`` [capacity] marks live rows,
  * Instances is a pytree, so it flows through jit/vmap/scan unchanged.

Batched usage stacks another leading dim (vmap over images), exactly like the
reference's "batched BoxList with trackings" pattern.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Instances:
    """A dict-of-arrays with shared leading dimension and a validity mask.

    Example::

        inst = Instances(
            image_size=(800, 1344),
            boxes=jnp.zeros((100, 4)),
            is_valid=jnp.zeros((100,), bool),
        )
        inst = inst.replace(scores=jnp.zeros((100,)))
    """

    def __init__(self, image_size: Tuple[int, int] = (0, 0), **fields: Any):
        # image_size is (h, w) static metadata (aux data in the pytree).
        self._image_size = tuple(image_size)
        self._fields: Dict[str, Any] = {}
        for k, v in fields.items():
            self.set(k, v)

    # -- field access ---------------------------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def set(self, name: str, value: Any) -> None:
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def get(self, name: str) -> Any:
        return self._fields[name]

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self.__dict__.get("_fields", {}):
            return self._fields[name]
        raise AttributeError(f"Instances has no field '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, value)
        else:
            self.set(name, value)

    def __contains__(self, name: str) -> bool:
        return name in self._fields

    def __iter__(self) -> Iterator[str]:
        return iter(self._fields)

    def __len__(self) -> int:
        """Static capacity (padded length), not the live count."""
        for v in self._fields.values():
            return v.shape[0]
        return 0

    def replace(self, **updates: Any) -> "Instances":
        new = Instances(self._image_size, **dict(self._fields))
        for k, v in updates.items():
            new.set(k, v)
        return new

    def num_valid(self) -> jnp.ndarray:
        """Traced count of live rows."""
        return jnp.sum(self._fields["is_valid"].astype(jnp.int32), axis=-1)

    # -- fixed-shape transforms -------------------------------------------------
    def gather(self, indices: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> "Instances":
        """Row-gather every field; optionally AND a new validity mask in.

        This is the fixed-shape replacement for boolean_mask/tf.gather chains:
        callers compute `indices` (e.g. from top_k or argsort) of static length
        and pass the accompanying validity.
        """
        out = {}
        for k, v in self._fields.items():
            out[k] = jnp.take(v, indices, axis=0)
        inst = Instances(self._image_size, **out)
        if valid is not None and "is_valid" in out:
            inst.set("is_valid", out["is_valid"] & valid)
        elif valid is not None:
            inst.set("is_valid", valid)
        return inst

    @staticmethod
    def cat(instances: list["Instances"]) -> "Instances":
        """Concatenate along the capacity axis (static shapes)."""
        assert len(instances) > 0
        keys = instances[0]._fields.keys()
        out = {}
        for k in keys:
            out[k] = jnp.concatenate([i._fields[k] for i in instances], axis=0)
        return Instances(instances[0]._image_size, **out)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        names = sorted(self._fields.keys())
        children = tuple(self._fields[n] for n in names)
        aux = (self._image_size, tuple(names))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, names = aux
        inst = cls.__new__(cls)
        inst._image_size = image_size
        inst._fields = dict(zip(names, children))
        return inst

    def __repr__(self) -> str:
        fields = ", ".join(
            f"{k}: {getattr(v, 'shape', v)}" for k, v in self._fields.items()
        )
        return f"Instances(image_size={self._image_size}, {fields})"
