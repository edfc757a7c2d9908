"""omni_pq_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the capabilities of
AIR-DISCOVER/Omni-PQ (semi-/omni-supervised room-layout estimation from point clouds).

Layer map (mirrors SURVEY.md §1, re-architected for TPU):
  ops/       Pallas kernels (FPS, ball query) + XLA gathers — the native-kernel tier
  models/    PointNet++ backbone, voting, DETR-style decoder, prediction heads (flax)
  losses/    supervised + consistency + gamma-mixture pseudo-label losses (pure jnp)
  data/      ScanNet / ARKitScenes loaders, augmentation, synthetic fixtures
  evals/     host-side numpy metrics (NMS, AP, quad F1) matching the reference
  train/     jitted train/eval steps, EMA teacher, optax, checkpointing
  parallel/  device mesh + sharding helpers (data-parallel first-class)
  cli/       train.py / eval.py with the reference flag surface
"""

__version__ = "0.1.0"
