"""Pure-jnp reference implementations (oracles) of the point-cloud kernels.

These encode the semantics of the reference CUDA ops (cited below) in plain
jax.numpy. They run on any backend and serve as the correctness oracles for the
Pallas kernels in fps.py / ball_query.py, and as fallbacks for tiny inputs.

Semantics sources (reference repo, studied not copied):
  - FPS: pointnet2/_ext_src/src/sampling_gpu.cu:74-234 — always seeds index 0,
    skips points with ||p||^2 <= 1e-3 (padding guard), iteratively selects the
    point maximizing the running min-distance to the selected set.
  - ball query: pointnet2/_ext_src/src/ball_query_gpu.cu:14-49 — for each
    center, the first (by index) <= nsample points with d^2 < r^2; unfilled
    slots duplicate the first hit.
  - three_nn: pointnet2/_ext_src/src/interpolate_gpu.cu:14-73 — 3 nearest
    known points per unknown point by brute force.
A pure-torch statement of the same semantics exists at
models/utils/pointnet_util.py:71-114.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

FPS_SKIP_NORM_SQ = 1e-3  # points with ||p||^2 <= this are never selected


def fps_ref(xyz: jax.Array, npoint: int) -> jax.Array:
    """Furthest point sampling, pure jnp.

    Args:
      xyz: (B, N, 3) float32 point coordinates.
      npoint: number of points to select (static).
    Returns:
      (B, npoint) int32 indices into N. Index 0 is always selected first.
    """
    B, N, _ = xyz.shape
    valid = jnp.sum(xyz * xyz, axis=-1) > FPS_SKIP_NORM_SQ  # (B, N)
    col = jnp.arange(N, dtype=jnp.int32)

    def body(i, carry):
        mindist, last, out = carry
        c = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - c) ** 2, axis=-1)  # (B, N)
        mindist = jnp.minimum(mindist, d)
        score = jnp.where(valid, mindist, -1.0)
        m = jnp.max(score, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(score >= m, col[None, :], N), axis=-1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return mindist, nxt, out

    out0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    mindist0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    last0 = jnp.zeros((B,), dtype=jnp.int32)
    _, _, out = jax.lax.fori_loop(1, npoint, body, (mindist0, last0, out0))
    return out


def ball_query_ref(radius: float, nsample: int, xyz: jax.Array,
                   new_xyz: jax.Array) -> jax.Array:
    """First-<=nsample-by-index neighbors within radius, pure jnp.

    Args:
      radius: ball radius.
      nsample: max neighbors per center (static).
      xyz: (B, N, 3) points.
      new_xyz: (B, S, 3) query centers.
    Returns:
      (B, S, nsample) int32 indices into N; empty slots repeat the first hit
      (0 if a center has no hits at all).
    """
    N = xyz.shape[1]
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    mask = d2 < radius * radius  # (B, S, N)
    # first nsample hits by index == nsample smallest of (idx if hit else N)
    key = jnp.where(mask, jnp.arange(N, dtype=jnp.int32)[None, None, :], N)
    neg_top, _ = jax.lax.top_k(-key, nsample)  # ascending hit indices
    idx = -neg_top
    first = idx[..., :1]
    idx = jnp.where(idx >= N, jnp.where(first >= N, 0, first), idx)
    return idx.astype(jnp.int32)


def three_nn_ref(unknown: jax.Array, known: jax.Array):
    """3 nearest known points for each unknown point.

    Args:
      unknown: (B, n, 3); known: (B, m, 3).
    Returns:
      (dist2, idx): (B, n, 3) float32 squared distances (ascending) and
      (B, n, 3) int32 indices into m.
    """
    d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)
