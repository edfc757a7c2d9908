"""Torch interop: run the reference PQ_Transformer on CPU against this repo.

- ext_shim: a CPU stand-in for the reference's CUDA `pointnet2._ext` module,
  backed by this repo's jnp kernel oracles (ops/reference.py), plus a loader
  that instantiates the reference network (/root/reference) on CPU.
- import_weights: transplant a torch state_dict into the flax param tree
  (Conv/Linear transposes, BatchNorm stat mapping) — the path for loading the
  reference's published .pth checkpoints.
- oracle_ops: swap the model's Pallas kernel bindings for the jnp oracles so
  full-scale forwards are fast on CPU and index computations are bitwise
  shared with the torch-side shim.
"""
