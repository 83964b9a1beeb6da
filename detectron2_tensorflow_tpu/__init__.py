"""detectron2_tensorflow_tpu: a TPU-native JAX re-build of the Detectron2 model family.

A brand-new framework with the capabilities of SimeonZhang/detectron2_tensorflow
(a TF-1.x Detectron2 port), re-designed TPU-first:

  * every model is a pure function over a params pytree, compiled once by XLA
    with **static padded shapes** (`is_valid` masks instead of dynamic shapes);
  * the hot irregular kernels (ROIAlign, NMS) are Pallas TPU kernels with
    XLA-fusion fallbacks;
  * distribution is a `jax.sharding.Mesh` + `pjit`/`shard_map`: gradients and
    SyncBN statistics ride ICI via `lax.pmean` — there is no hand-written
    communication backend (the reference's model_deploy.py layer dissolves);
  * checkpointing is Orbax; data is a host-side numpy/grain pipeline feeding
    fixed-size device buffers.

Public API parity: the ~300-key yacs config schema, the Boxes/Instances
structures, `build_model(cfg)`, and the Detectron2 weight converter mirror the
reference so its YAML configs and converted weights work unmodified.
"""

__version__ = "0.1.0"
