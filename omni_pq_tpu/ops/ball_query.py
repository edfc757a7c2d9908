"""Ball query (fixed-radius first-k neighbor search) as a TPU Pallas kernel.

Reference semantics: pointnet2/_ext_src/src/ball_query_gpu.cu:14-49 — for each
query center, the first (by point index) <= nsample points with d^2 < r^2;
unfilled slots duplicate the first hit.

TPU design: grid over (batch, center-tile). Each program holds a tile of T
centers in VMEM and streams the N points in lane-aligned chunks. Per chunk it
computes the (T, C) distance mask, turns it into global hit ranks with an
exclusive prefix-sum (done as a triangular-matrix matmul on the MXU — there is
no native cumsum), and deposits hit indices into their output slots with a
64-bin vectorized histogram. A `while_loop` early-exits the point stream once
every center in the tile has nsample hits, and chunks with no hits at all skip
the histogram — together these play the role of the CUDA kernel's per-thread
early `break`.

TODO(perf): the production plan is a sorted-window query — sort points and
centers by a spatial key once per SA layer (XLA sort), binary-search each
center tile's [min-r, max+r] window, and only stream that window through the
kernel via scalar-prefetch DMA. That bounds both the distance test and the
histogram to a small neighborhood instead of all N points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import ball_query_ref


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_CHUNK = 512  # points per streamed chunk (lane-aligned)
_TILE = 128   # centers per program


def _bq_kernel(radius: float, nsample: int, n_valid: int,
               x_ref, y_ref, z_ref, cx_ref, cy_ref, cz_ref,
               out_ref, acc_ref):
    T = cx_ref.shape[-1]
    npad = x_ref.shape[-1]
    nchunks = npad // _CHUNK
    r2 = radius * radius

    cx = cx_ref[0, 0, :].reshape(T, 1)
    cy = cy_ref[0, 0, :].reshape(T, 1)
    cz = cz_ref[0, 0, :].reshape(T, 1)

    acc_ref[:] = jnp.zeros((T, nsample), jnp.int32)

    # inclusive prefix-sum along lanes as an MXU matmul with an upper
    # triangular ones matrix: incl = mask @ U, U[k, j] = 1{k <= j}
    rows = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0)
    colsq = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    tri = (rows <= colsq).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, _CHUNK), 1)

    def body(carry):
        c, count = carry
        base = c * _CHUNK
        px = x_ref[0, 0, pl.ds(base, _CHUNK)].reshape(1, _CHUNK)
        py = y_ref[0, 0, pl.ds(base, _CHUNK)].reshape(1, _CHUNK)
        pz = z_ref[0, 0, pl.ds(base, _CHUNK)].reshape(1, _CHUNK)
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2
        gcols = cols + base
        mask = (d2 < r2) & (gcols < n_valid)
        maskf = mask.astype(jnp.float32)
        incl = jnp.dot(maskf, tri, preferred_element_type=jnp.float32)
        rank = incl.astype(jnp.int32) - mask.astype(jnp.int32)  # exclusive
        slot = count + rank
        validhit = mask & (slot < nsample)
        # idx+1 so that 0 means "slot untouched"
        val = jnp.where(validhit, gcols + 1, 0)

        # the 64-bin histogram is ~16x the cost of the distance test; skip it
        # for chunks with no hits (frequent on spatially-coherent scans)
        @pl.when(jnp.any(validhit))
        def _():
            for s in range(nsample):
                contrib = jnp.sum(jnp.where(slot == s, val, 0), axis=1)
                acc_ref[:, s] = acc_ref[:, s] + contrib

        count = count + jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
        return c + 1, count

    def cond(carry):
        c, count = carry
        return (c < nchunks) & (jnp.min(count) < nsample)

    count0 = jnp.zeros((T, 1), jnp.int32)
    jax.lax.while_loop(cond, body, (jnp.int32(0), count0))

    acc = acc_ref[:]
    first = jnp.maximum(acc[:, 0:1] - 1, 0)
    out_ref[0] = jnp.where(acc > 0, acc - 1, first)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """(B,N,3) points x (B,S,3) centers -> (B,S,nsample) int32 neighbor idx.

    Semantics match ball_query_ref / the reference CUDA op. Padded points
    should be far away or will be excluded via the n_valid bound (= N).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # non-differentiable (BallQuery autograd Function has no backward)
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    if N * S <= 256 * 1024:
        return ball_query_ref(radius, nsample, xyz, new_xyz)
    n_pad = (-N) % _CHUNK
    s_pad = (-S) % _TILE
    pts = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)),
                  constant_values=1e6).transpose(0, 2, 1)  # (B,3,Npad)
    ctr = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, s_pad), (0, 0)),
                  constant_values=1e6).transpose(0, 2, 1)  # (B,3,Spad)
    npad, spad = N + n_pad, S + s_pad
    # (B, 1, Npad) so per-row blocks satisfy the (sublane, lane) tiling rule
    pts = pts[:, :, None, :]
    ctr = ctr[:, :, None, :]

    grid = (B, spad // _TILE)
    pt_spec = pl.BlockSpec((1, 1, npad), lambda b, st: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((1, 1, _TILE), lambda b, st: (b, 0, st),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bq_kernel, float(radius), int(nsample), N),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, spad, nsample), jnp.int32),
        in_specs=[pt_spec] * 3 + [ct_spec] * 3,
        out_specs=pl.BlockSpec((1, _TILE, nsample), lambda b, st: (b, st, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_TILE, nsample), jnp.int32)],
        interpret=_interpret(),
    )(pts[:, 0], pts[:, 1], pts[:, 2], ctr[:, 0], ctr[:, 1], ctr[:, 2])
    return out[:, :S]
