"""three_nn / three_interpolate and gather/group ops as XLA primitives.

The reference implements these as CUDA kernels with atomicAdd backward passes
(pointnet2/_ext_src/src/interpolate_gpu.cu, group_points_gpu.cu,
sampling_gpu.cu:13-62). On TPU the forward gathers are near-optimal in XLA,
but the autodiff-derived scatter-add backward serializes badly (~55 ms/step
at the reference scale, round-1 profiling), so gather_points carries a
custom VJP that computes the segment sum with gather-only primitives:
sort the (index, position) pairs, permute the cotangents (a gather), a
two-level cumsum, and difference the prefix sums at the segment boundaries
(searchsorted + gather). Deterministic, unlike the CUDA atomics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def three_nn(unknown, known):
    """3 nearest known points per unknown point — 3 iterative argmin passes
    (an XLA top_k would sort all m per row: ~7x slower at these sizes).
    Non-differentiable (ThreeNN.backward returns None,
    pointnet2_utils.py:142-144) — interpolation weights are detached."""
    unknown = jax.lax.stop_gradient(unknown)
    known = jax.lax.stop_gradient(known)
    # |u-k|^2 via the MXU cross term — avoids materializing the (B,n,m,3)
    # difference tensor
    cross = jnp.einsum("bnc,bmc->bnm", unknown, known,
                       preferred_element_type=jnp.float32)
    d2 = (jnp.sum(unknown * unknown, -1)[:, :, None] - 2.0 * cross
          + jnp.sum(known * known, -1)[:, None, :])
    # cancellation can leave tiny negatives; sqrt would NaN downstream
    d2 = jnp.maximum(d2, 0.0)
    m = d2.shape[-1]
    cols = jnp.arange(m, dtype=jnp.int32)
    dists, idxs = [], []
    for _ in range(3):
        i = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        dists.append(jnp.min(d2, axis=-1))
        idxs.append(i)
        d2 = jnp.where(cols[None, None, :] == i[..., None], jnp.inf, d2)
    return jnp.stack(dists, axis=-1), jnp.stack(idxs, axis=-1)


def segment_sum_sorted(g: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """sum_{m: idx[m]=k} g[m] for k in [0, n) — g (M, C), idx (M,) -> (n, C).

    Gather-only TPU formulation of the scatter-add: sort, permute, prefix-sum,
    difference at segment boundaries. f32 accumulation regardless of g dtype.
    """
    M, C = g.shape
    perm = jnp.argsort(idx)
    idx_s = jnp.take(idx, perm)
    g_s = jnp.take(g.astype(jnp.float32), perm, axis=0)
    cs = jnp.cumsum(g_s, axis=0)
    # segment k occupies [b[k], b[k+1]) in the sorted order
    b = jnp.searchsorted(idx_s, jnp.arange(n + 1, dtype=idx_s.dtype),
                         side="left").astype(jnp.int32)
    cs_pad = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs], axis=0)
    return (jnp.take(cs_pad, b[1:], axis=0)
            - jnp.take(cs_pad, b[:-1], axis=0)).astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_points(points, idx, n):
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def _gather_points_fwd(points, idx, n):
    return _gather_points(points, idx, n), idx


def _gather_points_bwd(n, idx, g):
    # g (B, S, C) -> grad_points (B, n, C) via the sorted segment sum
    grad = jax.vmap(lambda gg, ii: segment_sum_sorted(gg, ii, n))(g, idx)
    return grad, None


_gather_points.defvjp(_gather_points_fwd, _gather_points_bwd)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, N, C), idx (B, S) -> (B, S, C).

    Channel-last equivalent of the reference's gather_points
    (sampling_gpu.cu:13-62, which is (B, C, N) x (B, C, S) -> (B, C, S));
    backward is the gather-only segment sum above instead of XLA's scatter.
    """
    return _gather_points(points, idx.astype(jnp.int32), points.shape[1])


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, N, C), idx (B, S, K) -> (B, S, K, C).

    Channel-last equivalent of group_points (group_points_gpu.cu:13-80).
    """
    B, S, K = idx.shape
    flat = gather_points(points, idx.reshape(B, S * K))
    return flat.reshape(B, S, K, points.shape[-1])


def three_interpolate(feats: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """feats (B, m, C), idx (B, n, 3), weight (B, n, 3) -> (B, n, C).

    Weighted 3-NN feature interpolation (interpolate_gpu.cu:77-159).
    """
    gathered = group_points(feats, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolate_features(unknown_xyz: jax.Array, known_xyz: jax.Array,
                         known_feats: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Full FP-module interpolation: 3-NN inverse-distance weighting.

    Matches PointnetFPModule's weighting (pointnet2_modules.py:393-401) with
    euclidean d (the ThreeNN wrapper sqrt's the kernel's squared distances,
    pointnet2_utils.py:140): w_i = (1/(d_i+1e-8)) / sum_j (1/(d_j+1e-8)).
    """
    dist2, idx = three_nn(unknown_xyz, known_xyz)
    recip = 1.0 / (jnp.sqrt(dist2) + eps)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(known_feats, idx, weight)
