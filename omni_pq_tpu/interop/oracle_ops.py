"""Swap the model's kernel bindings to the jnp oracles (CPU-fast paths).

The Pallas kernels run in interpreter mode on CPU, which is far too slow for
a full-architecture forward (sa1 alone is a 2048-step grid). For CPU
cross-execution against the reference network, `oracle_model_ops()` rebinds
the `fps` / `ball_query` / `ball_query_group` names that the model modules
imported to oracle-backed equivalents (ops/reference.py — the same functions
the torch-side ext_shim calls, so index decisions are bitwise-shared).

Kernel==oracle parity is separately enforced bitwise by tests/test_ops.py;
this swap trades nothing but interpreter wall-clock.
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

from ..ops.reference import fps_ref, ball_query_ref


@functools.partial(jax.jit, static_argnums=(1,))
def fps_oracle(xyz, npoint):
    return fps_ref(jax.lax.stop_gradient(xyz.astype(jnp.float32)), npoint)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_oracle(radius, nsample, xyz, new_xyz):
    return ball_query_ref(radius, nsample,
                          jax.lax.stop_gradient(xyz.astype(jnp.float32)),
                          jax.lax.stop_gradient(new_xyz.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_group_oracle(radius, nsample, xyz, new_xyz):
    """QueryAndGroup composition (pointnet2_utils.py:294-352) via the oracle:
    returns (idx, xyz[idx] - center), with the reference CUDA padding
    semantics for a no-hit center (all slots point at xyz[0], so the grouped
    value is xyz[0] - center) — the same semantics the fused Pallas
    ball_query_group now implements (ops/ball_query.py).

    Index DECISIONS are made on f32 copies of the coordinates so they stay
    bitwise-shared with the torch-side ext_shim under any precision; the
    grouped VALUES keep the caller's dtype (a no-op for f32 inputs, and
    required so a float64 cross-execution run is not silently capped at
    single precision)."""
    idx = ball_query_ref(radius, nsample,
                         jax.lax.stop_gradient(xyz.astype(jnp.float32)),
                         jax.lax.stop_gradient(new_xyz.astype(jnp.float32)))
    B, S, K = idx.shape
    flat = jnp.take_along_axis(xyz, idx.reshape(B, S * K)[..., None], axis=1)
    grouped = flat.reshape(B, S, K, 3) - new_xyz[:, :, None, :]
    return idx, grouped


@contextlib.contextmanager
def oracle_model_ops():
    """Within the context, PQTransformer forwards use the jnp oracles for
    FPS and ball-query grouping (gathers/3-NN are already plain XLA)."""
    from ..models import pointnet2, pq_transformer

    saved = [(pointnet2, "fps", pointnet2.fps),
             (pointnet2, "ball_query", pointnet2.ball_query),
             (pointnet2, "ball_query_group", pointnet2.ball_query_group),
             (pq_transformer, "fps", pq_transformer.fps)]
    try:
        pointnet2.fps = fps_oracle
        pointnet2.ball_query = ball_query_oracle
        pointnet2.ball_query_group = ball_query_group_oracle
        pq_transformer.fps = fps_oracle
        yield
    finally:
        for mod, name, fn in saved:
            setattr(mod, name, fn)
