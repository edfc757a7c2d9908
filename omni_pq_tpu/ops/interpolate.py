"""three_nn / three_interpolate and gather/group ops as XLA primitives.

The reference implements these as CUDA kernels with atomicAdd backward passes
(pointnet2/_ext_src/src/interpolate_gpu.cu, group_points_gpu.cu,
sampling_gpu.cu:13-62). On TPU both directions stay native XLA: the forward
is a gather, and autodiff derives a scatter-add backward that XLA lowers
well — and, unlike the CUDA atomics, deterministically.

Measured dead-end (v5e, 2026-08-16, kept as a warning): a "gather-only"
segment-sum backward (argsort indices + permute cotangents + cumsum +
prefix-difference at searchsorted segment boundaries) was tried to avoid the
scatter. A/B at the real SA-layer shapes showed it 3.9x SLOWER than XLA's
scatter at sa1 (B6 N40000 S2048 K64 C4: 84 ms vs 22 ms fwd+bwd), 5-9x slower
at sa2/sa3, and 165x slower at vote-aggregation shapes — the sort and the
(S*K, C) cumsum dwarf the scatter they replace. XLA's TPU scatter-add needs
no replacement here.
"""
from __future__ import annotations

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
    idxs = []
    for _ in range(3):
        i = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        idxs.append(i)
        d2 = jnp.where(cols[None, None, :] == i[..., None], jnp.inf, d2)
    idx = jnp.stack(idxs, axis=-1)  # (B, n, 3)
    # Recompute the 3 selected distances DIRECTLY (the reference CUDA
    # semantics, interpolate_gpu.cu:13-52): the MXU form's cancellation
    # noise lands exactly where the FP layers are most sensitive — an
    # unknown point that coincides with a known point (every FPS-selected
    # seed!) must get d2 == 0.0, or the 1/(d+1e-8) interpolation weighting
    # amplifies the ~1e-6 residue into ~1e-3 feature deviations (measured
    # via float64 cross-execution against the reference network,
    # tests/test_torch_parity.py). Selection order still follows the MXU
    # distances (near-tie flips documented in PARITY.md); the gather is 3
    # rows/query — negligible next to the (n, m) distance matrix.
    B, n, _ = unknown.shape
    sel = jnp.take_along_axis(known, idx.reshape(B, n * 3)[..., None],
                              axis=1, mode="promise_in_bounds")
    diff = sel.reshape(B, n, 3, 3) - unknown[:, :, None, :]
    return jnp.sum(diff * diff, axis=-1), idx


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points (B, N, C), idx (B, S) -> (B, S, C).

    CONTRACT: every index must be in [0, N) — indices are gathered with
    mode='promise_in_bounds', so an out-of-range index (e.g. -1 padding)
    reads unspecified memory instead of clamping. All in-tree callers pass
    kernel-produced indices (fps / ball_query / three_nn outputs), which
    are in-bounds by construction; validate before calling with anything
    else.

    Channel-last equivalent of the reference's gather_points
    (sampling_gpu.cu:13-62, which is (B, C, N) x (B, C, S) -> (B, C, S));
    autodiff derives the deterministic XLA scatter-add backward (see module
    docstring for the measured A/B that keeps it this way).
    """
    # callers pass kernel-produced indices (fps / ball_query / three_nn
    # outputs), always < N: promise_in_bounds drops the NaN-fill select +
    # predicate broadcast XLA otherwise fuses around every gather (and the
    # bounds checks from its scatter-add VJP)
    return jnp.take_along_axis(points, idx.astype(jnp.int32)[..., None],
                               axis=1, mode="promise_in_bounds")


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
