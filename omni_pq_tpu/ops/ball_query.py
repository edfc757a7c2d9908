"""Ball query (fixed-radius first-k neighbor search) as a TPU Pallas kernel.

Reference semantics: pointnet2/_ext_src/src/ball_query_gpu.cu:14-49 — for each
query center, the first (by point index) <= nsample points with d^2 < r^2;
unfilled slots duplicate the first hit. Semantics here are EXACT (same index
order, same padding).

TPU design: a 3-D grid (batch, center-tile, point-chunk) so Mosaic pipelines
the chunk stream (double-buffered, ~zero per-step overhead — a while_loop
formulation costs ~5us/chunk in loop machinery). Accumulator state (output
slots + per-center hit counts) lives in VMEM scratch, which persists across
grid steps; it is reset at chunk 0 and flushed to the output block at the
last chunk. Per chunk the kernel computes the (T, C) distance mask, turns it
into global hit ranks with an MXU prefix-sum matmul, and deposits hit indices
into their slots with a 64-bin vectorized histogram.

Work skipping (the role of the CUDA kernel's per-thread early `break`):
  1. chunk-bbox skip: per-chunk xyz bounds are precomputed outside and
     prefetched to SMEM; a chunk whose radius-expanded bbox misses the tile's
     center bbox skips all compute. Centers are Morton-reordered inside the
     wrapper (pure reordering) so tiles are spatially tight, and the data
     pipeline emits Morton-ordered clouds (data/spatial.py) so chunks are
     too — together they make most (tile, chunk) pairs skippable.
  2. all-full skip: once every center in the tile has nsample hits the
     remaining chunks do nothing.
  3. no-hit chunks skip the 64-bin histogram (16x the distance-test cost).
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


def _spread_bits_u32(v):
    """Insert two zero bits between each of the low 10 bits."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton_code(pts):
    """(B, S, 3) float -> (B, S) uint32 Morton code (10 bits/axis).

    FPS emits centers in selection order (spatially spread), so a tile of
    consecutive centers would cover the whole scene and its bbox would never
    exclude a chunk. Sorting centers by Morton code makes tiles spatially
    tight, which is what arms the chunk-bbox skip."""
    lo = jnp.min(pts, axis=1, keepdims=True)
    hi = jnp.max(pts, axis=1, keepdims=True)
    scale = jnp.where(hi > lo, 1023.0 / (hi - lo), 0.0)
    q = jnp.clip((pts - lo) * scale, 0, 1023).astype(jnp.uint32)
    return (_spread_bits_u32(q[..., 0]) | (_spread_bits_u32(q[..., 1]) << 1)
            | (_spread_bits_u32(q[..., 2]) << 2))


def _bq_kernel(radius: float, nsample: int, n_valid: int,
               cb_ref, x_ref, y_ref, z_ref,
               cx_ref, cy_ref, cz_ref, out_ref, acc_ref, count_ref, tb_ref):
    T = cx_ref.shape[-1]
    C = x_ref.shape[-1]
    r2 = radius * radius
    b = pl.program_id(0)
    c = pl.program_id(2)
    nchunks = pl.num_programs(2)

    cx = cx_ref[0, 0, :].reshape(T, 1)
    cy = cy_ref[0, 0, :].reshape(T, 1)
    cz = cz_ref[0, 0, :].reshape(T, 1)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros((T, nsample), jnp.int32)
        count_ref[:] = jnp.zeros((T, 1), jnp.int32)
        # tile bounds over real centers only (padding sits at 1e6);
        # loop-invariant, cached in SMEM for the per-chunk overlap test
        real = cx < 5e5
        big = jnp.float32(3e6)
        tb_ref[0] = jnp.min(jnp.where(real, cx, big)) - radius
        tb_ref[1] = jnp.max(jnp.where(real, cx, -big)) + radius
        tb_ref[2] = jnp.min(jnp.where(real, cy, big)) - radius
        tb_ref[3] = jnp.max(jnp.where(real, cy, -big)) + radius
        tb_ref[4] = jnp.min(jnp.where(real, cz, big)) - radius
        tb_ref[5] = jnp.max(jnp.where(real, cz, -big)) + radius

    # chunk-bbox vs tile-bbox overlap (scalars from SMEM)
    overlap = ((cb_ref[b, c, 0] <= tb_ref[1]) & (cb_ref[b, c, 1] >= tb_ref[0])
               & (cb_ref[b, c, 2] <= tb_ref[3]) & (cb_ref[b, c, 3] >= tb_ref[2])
               & (cb_ref[b, c, 4] <= tb_ref[5]) & (cb_ref[b, c, 5] >= tb_ref[4]))
    not_full = jnp.min(count_ref[:]) < nsample

    @pl.when(overlap & not_full)
    def _():
        px = x_ref[0, 0, :].reshape(1, C)
        py = y_ref[0, 0, :].reshape(1, C)
        pz = z_ref[0, 0, :].reshape(1, C)
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2
        base = c * C
        gcols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1) + base
        mask = (d2 < r2) & (gcols < n_valid)

        @pl.when(jnp.any(mask))
        def _():
            count = count_ref[:]
            # inclusive prefix-sum along lanes as an MXU matmul with an
            # upper triangular ones matrix
            rows = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
            colsq = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
            tri = (rows <= colsq).astype(jnp.float32)
            maskf = mask.astype(jnp.float32)
            incl = jnp.dot(maskf, tri, preferred_element_type=jnp.float32)
            rank = incl.astype(jnp.int32) - mask.astype(jnp.int32)
            slot = count + rank
            validhit = mask & (slot < nsample)
            # idx+1 so that 0 means "slot untouched"
            val = jnp.where(validhit, gcols + 1, 0)

            @pl.when(jnp.any(validhit))
            def _():
                for s in range(nsample):
                    contrib = jnp.sum(jnp.where(slot == s, val, 0), axis=1)
                    acc_ref[:, s] = acc_ref[:, s] + contrib

            count_ref[:] = count + jnp.sum(mask.astype(jnp.int32), axis=1,
                                           keepdims=True)

    @pl.when(c == nchunks - 1)
    def _():
        acc = acc_ref[:]
        first = jnp.maximum(acc[:, 0:1] - 1, 0)
        out_ref[0] = jnp.where(acc > 0, acc - 1, first)


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """(B,N,3) points x (B,S,3) centers -> (B,S,nsample) int32 neighbor idx.

    Bitwise-identical to ball_query_ref."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # non-differentiable (BallQuery autograd Function has no backward)
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)
    if N * S <= 256 * 1024:
        return ball_query_ref(radius, nsample, xyz, new_xyz)
    n_pad = (-N) % _CHUNK
    s_pad = (-S) % _TILE
    npad, spad = N + n_pad, S + s_pad

    pts = jnp.pad(xyz, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e6)
    ctr = jnp.pad(new_xyz, ((0, 0), (0, s_pad), (0, 0)), constant_values=1e6)

    # Morton-order the centers (pure reordering; padding centers carry the
    # max code and collect at the end)
    code = jnp.where(ctr[..., 0] < 5e5, _morton_code(ctr), jnp.uint32(0xFFFFFFFF))
    corder = jnp.argsort(code, axis=1)
    ctr = jnp.take_along_axis(ctr, corder[..., None], axis=1)

    # per-chunk xyz bounds -> (B, nchunks, 6) f32, prefetched to SMEM
    nchunks = npad // _CHUNK
    chunked = pts.reshape(B, nchunks, _CHUNK, 3)
    cb = jnp.stack([
        chunked[..., 0].min(-1), chunked[..., 0].max(-1),
        chunked[..., 1].min(-1), chunked[..., 1].max(-1),
        chunked[..., 2].min(-1), chunked[..., 2].max(-1),
    ], axis=-1)

    pts_t = pts.transpose(0, 2, 1)[:, :, None, :]  # (B,3,1,Npad)
    ctr_t = ctr.transpose(0, 2, 1)[:, :, None, :]

    pt_spec = pl.BlockSpec((1, 1, _CHUNK), lambda b, st, c, *_: (b, 0, c),
                           memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((1, 1, _TILE), lambda b, st, c, *_: (b, 0, st),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cb: full (B, nchunks, 6) array in SMEM
        grid=(B, spad // _TILE, nchunks),
        in_specs=[pt_spec] * 3 + [ct_spec] * 3,
        out_specs=pl.BlockSpec((1, _TILE, nsample),
                               lambda b, st, c, *_: (b, st, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_TILE, nsample), jnp.int32),
                        pltpu.VMEM((_TILE, 1), jnp.int32),
                        pltpu.SMEM((6,), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_bq_kernel, float(radius), int(nsample), N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, spad, nsample), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(cb, pts_t[:, 0], pts_t[:, 1], pts_t[:, 2],
      ctr_t[:, 0], ctr_t[:, 1], ctr_t[:, 2])
    # un-permute centers back to caller order
    inv = jnp.argsort(corder, axis=1)
    out = jnp.take_along_axis(out, inv[..., None], axis=1)
    return out[:, :S]
