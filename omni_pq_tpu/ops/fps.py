"""Furthest point sampling as a TPU Pallas kernel.

Reference semantics: pointnet2/_ext_src/src/sampling_gpu.cu:74-234 (one CUDA
block per batch row, shared-memory argmax reduction, seeds index 0, skips
points with ||p||^2 <= 1e-3). The TPU design instead vectorizes over the batch
in the sublane dimension and over points in the lane dimension: the whole
running min-distance state lives in VMEM and each of the `npoint` steps is a
handful of (B, N) VPU passes plus a lane-reduction argmax. The inherently
sequential selection loop is a `lax.fori_loop` carried entirely on-chip — no
HBM traffic after the initial load.

Layout: coordinates are passed as three (B, N) planes so N sits on the fast
(lane) axis; gathering the coordinates of the last-selected point is done with
a one-hot masked reduction (per-row dynamic lane indexing is not a TPU
primitive, a masked reduce is exactly as fast here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import FPS_SKIP_NORM_SQ, fps_ref

_LANE = 128
# max batch rows processed per kernel invocation; keeps VMEM under ~8MB at
# N=40k (4 planes x Bc x N x 4B).
_MAX_ROWS = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fps_kernel(npoint: int, x_ref, y_ref, z_ref, out_ref, mind_ref):
    B, N = x_ref.shape
    x, y, z = x_ref[:], y_ref[:], z_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    ocols = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)
    valid = (x * x + y * y + z * z) > FPS_SKIP_NORM_SQ
    mind_ref[:] = jnp.full((B, N), 1e10, dtype=jnp.float32)
    out_ref[:] = jnp.zeros((B, npoint), dtype=jnp.int32)

    def body(i, last):
        onehot = (cols == last).astype(jnp.float32)
        cx = jnp.sum(x * onehot, axis=1, keepdims=True)
        cy = jnp.sum(y * onehot, axis=1, keepdims=True)
        cz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        score = jnp.where(valid, mind, -1.0)
        m = jnp.max(score, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(score >= m, cols, N), axis=1, keepdims=True)
        nxt = nxt.astype(jnp.int32)
        # dynamic single-lane stores are not expressible on TPU; deposit the
        # selected index with a one-hot accumulate over the output row instead
        out_ref[:] = out_ref[:] + nxt * (ocols == i).astype(jnp.int32)
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((B, 1), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,))
def fps(xyz: jax.Array, npoint: int) -> jax.Array:
    """Furthest point sampling: (B, N, 3) float32 -> (B, npoint) int32.

    Matches fps_ref / the reference CUDA op: index 0 always selected first,
    near-origin points (padding) never selected. Zero-padding N is safe.
    """
    B, N, _ = xyz.shape
    # non-differentiable, like the reference's FurthestPointSampling autograd
    # Function (pointnet2_utils.py:51-80, backward returns None)
    xyz = jax.lax.stop_gradient(xyz)
    if N <= npoint:
        # degenerate; fall back to oracle (static shapes still required)
        return fps_ref(xyz, npoint)
    n_pad = (-N) % _LANE
    planes = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)))
    planes = planes.transpose(0, 2, 1)  # (B, 3, Npad)
    npad = N + n_pad

    def run(chunk):  # (Bc, 3, Npad)
        bc = chunk.shape[0]
        return pl.pallas_call(
            functools.partial(_fps_kernel, npoint),
            out_shape=jax.ShapeDtypeStruct((bc, npoint), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bc, npad), jnp.float32)],
            interpret=_interpret(),
        )(chunk[:, 0], chunk[:, 1], chunk[:, 2])

    if B <= _MAX_ROWS:
        return run(planes)
    # split the batch to bound VMEM; remainder handled by padding rows with 0s
    b_pad = (-B) % _MAX_ROWS
    planes = jnp.pad(planes, ((0, b_pad), (0, 0), (0, 0)))
    chunks = planes.reshape(-1, _MAX_ROWS, 3, npad)
    out = jax.lax.map(run, chunks).reshape(-1, npoint)
    return out[:B]
