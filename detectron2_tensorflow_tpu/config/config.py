"""A self-contained yacs-compatible config system.

Re-implements the config behavior of the reference
(/root/reference/lib/config/config.py:30-171): an attribute-accessible nested
dict with

  * ``merge_from_file`` supporting ``_BASE_`` yaml inheritance,
  * ``merge_from_list`` for ``--opts KEY VALUE`` CLI overrides,
  * type-checked merges that reject unknown keys,
  * ``freeze``/``defrost`` immutability,
  * insertion of computed keys prefixed ``COMPUTED_`` even on frozen configs.

yacs itself is not a dependency of this framework; this module is the full
implementation (~yacs semantics, independently written for JAX-side use).
"""

from __future__ import annotations

import copy
import io
import os
from ast import literal_eval
from typing import Any, Dict, List

import yaml

BASE_KEY = "_BASE_"
COMPUTED_PREFIX = "COMPUTED_"

# Types allowed as config leaf values.
_VALID_TYPES = (tuple, list, str, int, float, bool, type(None))


class CfgNode(dict):
    """A nested, attribute-accessible configuration node."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: Dict | None = None):
        init_dict = {} if init_dict is None else init_dict
        init_dict = self._create_config_tree_from_dict(init_dict)
        super().__init__(init_dict)
        self.__dict__[CfgNode.IMMUTABLE] = False

    @classmethod
    def _create_config_tree_from_dict(cls, dic: Dict) -> Dict:
        dic = copy.deepcopy(dic)
        for k, v in dic.items():
            if isinstance(v, dict):
                dic[k] = cls(v)
            else:
                _assert_valid_type(v, f"Key {k} with value {type(v)}")
        return dic

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            if name.startswith(COMPUTED_PREFIX):
                # Computed keys may be inserted (never overwritten) after
                # finalize, matching reference config.py:126-140.
                if name in self:
                    raise KeyError(f"Computed key '{name}' already set")
                self[name] = value
                return
            raise AttributeError(
                f"Attempted to set '{name}' but CfgNode is immutable"
            )
        _assert_valid_type(value, f"Key {name}", allow_cfg_node=True)
        self[name] = value

    # -- immutability -------------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[CfgNode.IMMUTABLE]

    def _set_immutable(self, is_immutable: bool) -> None:
        self.__dict__[CfgNode.IMMUTABLE] = is_immutable
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(is_immutable)

    # -- clone / merge ------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = False) -> None:
        """Merge a yaml file, resolving ``_BASE_`` inheritance recursively.

        Upstream-Detectron2 key spellings (MODEL.WEIGHTS, INPUT.MIN_SIZE_*,
        tuple-valued DATASETS.TRAIN/TEST, DATALOADER.NUM_WORKERS) are
        rewritten onto this schema first, so D2 model-zoo and
        quick_schedules YAMLs merge unmodified.
        """
        loaded = _load_yaml_with_base(cfg_filename)
        _apply_upstream_aliases(loaded)
        loaded = type(self)(loaded)
        self.merge_from_other_cfg(loaded)

    def merge_from_other_cfg(self, cfg_other: "CfgNode") -> None:
        _merge_a_into_b(cfg_other, self, self, [])

    def merge_from_list(self, cfg_list: List[str]) -> None:
        """Merge ``[KEY1, VAL1, KEY2, VAL2, ...]`` (the ``--opts`` override)."""
        if len(cfg_list) % 2 != 0:
            raise ValueError(f"Override list has odd length: {cfg_list}")
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            key_parts = full_key.split(".")
            d = self
            for sub in key_parts[:-1]:
                if sub not in d:
                    raise KeyError(f"Non-existent key: {full_key}")
                d = d[sub]
            sub = key_parts[-1]
            if sub not in d:
                raise KeyError(f"Non-existent key: {full_key}")
            value = _decode_cfg_value(v)
            value = _check_and_coerce_cfg_value_type(value, d[sub], full_key)
            if d.is_frozen():
                raise AttributeError(
                    f"Attempted to set '{full_key}' but CfgNode is immutable"
                )
            d[sub] = value

    # -- dump ----------------------------------------------------------------
    def dump(self) -> str:
        def _to_dict(node):
            if isinstance(node, CfgNode):
                return {k: _to_dict(v) for k, v in node.items()}
            if isinstance(node, tuple):
                return list(node)
            return node

        return yaml.safe_dump(_to_dict(self), default_flow_style=False)

    def __str__(self) -> str:
        def _indent(s, n=2):
            pad = " " * n
            return "\n".join(pad + line for line in s.split("\n"))

        lines = []
        for k, v in sorted(self.items()):
            if isinstance(v, CfgNode):
                lines.append(f"{k}:\n{_indent(str(v))}")
            else:
                lines.append(f"{k}: {v}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({super().__repr__()})"


def _assert_valid_type(value: Any, msg: str, allow_cfg_node: bool = False) -> None:
    valid = _VALID_TYPES + ((CfgNode, dict) if allow_cfg_node else ())
    if not isinstance(value, valid):
        raise ValueError(f"{msg} is not a valid config leaf type")


class _RestrictedEvalLoader(yaml.SafeLoader):
    """SafeLoader plus the one unsafe tag reference configs actually use.

    Reference YAMLs (e.g. Base-RetinaNet.yaml:7) compute anchor sizes with
    ``!!python/object/apply:eval``; yacs handles it by falling back to full
    ``yaml.unsafe_load``. We instead evaluate only that tag, with builtins
    stripped — enough for the arithmetic expressions configs contain, without
    arbitrary-object deserialization.
    """


def _construct_eval(loader, node):
    args = loader.construct_sequence(node)
    if len(args) != 1 or not isinstance(args[0], str):
        raise yaml.constructor.ConstructorError(
            None, None, f"unsupported eval form: {args}", node.start_mark
        )
    return eval(args[0], {"__builtins__": {}}, {})  # noqa: S307 (restricted)


_RestrictedEvalLoader.add_constructor(
    "tag:yaml.org,2002:python/object/apply:eval", _construct_eval
)


def _load_yaml_with_base(filename: str) -> Dict:
    with io.open(filename, "r", encoding="utf-8") as f:
        cfg = yaml.load(f, Loader=_RestrictedEvalLoader)
    if cfg is None:
        cfg = {}
    if BASE_KEY in cfg:
        base_filename = cfg.pop(BASE_KEY)
        if not os.path.isabs(base_filename):
            base_filename = os.path.join(os.path.dirname(filename), base_filename)
        base_cfg = _load_yaml_with_base(base_filename)
        _merge_dict_a_into_b(cfg, base_cfg)
        return base_cfg
    return cfg


def _apply_upstream_aliases(loaded: Dict) -> None:
    """Rewrite upstream-Detectron2 config keys onto this schema, in place.

    The reference inherits its schema from the TF Object Detection API, but
    ships D2 quick_schedules YAMLs that use upstream keys its own loader
    rejects; this shim makes both dialects merge here.

      * MODEL.WEIGHTS -> PRETRAINS.DETECTRON2 (full-model D2 pickle) or
        PRETRAINS.BACKBONE (ImageNetPretrained pickles); ``detectron2://``
        URIs keep their path so PRETRAINS.ROOT can point at a local mirror.
      * INPUT.{MIN,MAX}_SIZE_{TRAIN,TEST} -> TRANSFORM.RESIZE.*
      * DATASETS.TRAIN/TEST tuples -> DATASETS.TRAIN/VAL strings (first
        entry; this framework evaluates one dataset per run)
      * DATALOADER.NUM_WORKERS -> DATALOADER.NUM_READERS
    """
    model = loaded.get("MODEL")
    if isinstance(model, dict) and "WEIGHTS" in model:
        weights = model.pop("WEIGHTS") or ""
        if weights:
            path = weights.split("://", 1)[-1]
            pre = loaded.setdefault("PRETRAINS", {})
            if "ImageNetPretrained" in weights:
                pre.setdefault("BACKBONE", path)
            else:
                pre.setdefault("DETECTRON2", path)

    inp = loaded.get("INPUT")
    if isinstance(inp, dict):
        moved = {}
        for k in ("MIN_SIZE_TRAIN", "MAX_SIZE_TRAIN",
                  "MIN_SIZE_TEST", "MAX_SIZE_TEST"):
            if k in inp:
                moved[k] = inp.pop(k)
        if moved:
            loaded.setdefault("TRANSFORM", {}).setdefault("RESIZE", {}).update(moved)

    ds = loaded.get("DATASETS")
    if isinstance(ds, dict):
        for src, dst in (("TRAIN", "TRAIN"), ("TEST", "VAL")):
            v = _decode_cfg_value(ds.get(src))  # yaml tuples arrive as strings
            if isinstance(v, (list, tuple)):
                ds.pop(src)
                if v:
                    ds[dst] = str(v[0])

    dl = loaded.get("DATALOADER")
    if isinstance(dl, dict) and "NUM_WORKERS" in dl:
        dl["NUM_READERS"] = dl.pop("NUM_WORKERS")

    sol = loaded.get("SOLVER")
    if isinstance(sol, dict) and "CHECKPOINT_PERIOD" in sol:
        # Upstream-D2 save cadence -> the two-tier scheme's short-term
        # interval (the reference's CheckpointKeepingHook vocabulary).
        sol.setdefault("SHORT_TERM_SAVE_STEPS", sol["CHECKPOINT_PERIOD"])


def _merge_dict_a_into_b(a: Dict, b: Dict) -> None:
    for k, v in a.items():
        if isinstance(v, dict) and k in b and isinstance(b[k], dict):
            _merge_dict_a_into_b(v, b[k])
        else:
            b[k] = v


def _merge_a_into_b(a: CfgNode, b: CfgNode, root: CfgNode, key_list: List[str]) -> None:
    for k, v_ in a.items():
        full_key = ".".join(key_list + [k])
        if k not in b:
            raise KeyError(f"Non-existent config key: {full_key}")
        v = copy.deepcopy(v_)
        v = _decode_cfg_value(v)
        v = _check_and_coerce_cfg_value_type(v, b[k], full_key)
        if isinstance(v, CfgNode) or isinstance(v, dict):
            if not isinstance(b[k], CfgNode):
                raise ValueError(f"Cannot merge dict into non-dict at {full_key}")
            _merge_a_into_b(
                v if isinstance(v, CfgNode) else CfgNode(v), b[k], root, key_list + [k]
            )
        else:
            b[k] = v


def _decode_cfg_value(value: Any) -> Any:
    if isinstance(value, (dict, CfgNode)):
        return CfgNode(value) if not isinstance(value, CfgNode) else value
    if not isinstance(value, str):
        return value
    try:
        value = literal_eval(value)
    except (ValueError, SyntaxError):
        pass  # plain string
    return value


def _check_and_coerce_cfg_value_type(replacement: Any, original: Any, full_key: str) -> Any:
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type or original is None:
        return replacement
    # Allowed implicit casts, matching yacs semantics.
    casts = [(tuple, list), (list, tuple), (int, float)]
    for src, dst in casts:
        if replacement_type == src and original_type == dst:
            return dst(replacement)
    if isinstance(original, (dict, CfgNode)) and isinstance(replacement, (dict, CfgNode)):
        return replacement
    raise ValueError(
        f"Type mismatch ({original_type} vs {replacement_type}) for config key "
        f"{full_key}: {original} vs {replacement}"
    )


# A do-whatever-you-want hack node, mirroring reference global_cfg.
global_cfg = CfgNode()


def set_global_cfg(cfg: CfgNode) -> None:
    global global_cfg
    global_cfg.clear()
    global_cfg.update(cfg)


def get_cfg() -> CfgNode:
    """Return a fresh copy of the default config tree."""
    from .defaults import _C

    return _C.clone()
