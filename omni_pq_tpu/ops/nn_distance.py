"""Chamfer (nearest-neighbor) distance between point sets, pure jnp.

Semantics of utils/nn_distance.py:34-61 in the reference: O(N*M) pairwise
distances, min over each axis, with squared-L2 (default), L1, or huber
variants. Used by every GT-assignment / set-matching step in the losses.
"""
from __future__ import annotations

import jax.numpy as jnp


def huber_loss(error, delta: float = 1.0):
    """0.5*x^2 for |x|<=delta else 0.5*delta^2 + delta*(|x|-delta)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def smoothl1_loss(error, delta: float = 1.0):
    """Smooth-L1 as in models/utils/losses.py:5-18 (same as huber here)."""
    diff = jnp.abs(error)
    return jnp.where(diff < delta,
                     0.5 * diff ** 2 / delta,
                     diff - 0.5 * delta)


def nn_distance(pc1, pc2, l1smooth: bool = False, delta: float = 1.0,
                l1: bool = False):
    """pc1 (B,N,C), pc2 (B,M,C) -> dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M)."""
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]
    if l1smooth:
        dist = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sum(diff ** 2, axis=-1)
    dist1 = jnp.min(dist, axis=2)
    idx1 = jnp.argmin(dist, axis=2).astype(jnp.int32)
    dist2 = jnp.min(dist, axis=1)
    idx2 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2
