"""Ball query (fixed-radius first-k neighbor search) as a TPU Pallas kernel.

Reference semantics: pointnet2/_ext_src/src/ball_query_gpu.cu:14-49 — for each
query center, the first (by point index) <= nsample points with d^2 < r^2;
unfilled slots duplicate the first hit. Semantics here are EXACT (same index
order, same padding).

TPU design: a 3-D grid (batch, center-tile, chunk-slot) so Mosaic pipelines
the chunk stream (double-buffered, ~zero per-step overhead — a while_loop
formulation costs ~5us/chunk in loop machinery). Accumulator state (output
slots + per-center hit counts) lives in VMEM scratch, which persists across
grid steps; it is reset at slot 0 and flushed to the output block at the
last slot. Per chunk the kernel computes the (T, C) distance mask, turns it
into global hit ranks with windowed MXU prefix-sum matmuls, then deposits hit
indices by INVERTING the (monotone) prefix sums: per 128-lane window, a
7-step binary search over each row's inclusive counts (dynamic_gather lane
shuffles) finds the column of every demanded rank. This searchsorted deposit
replaced a 64-section masked-reduction histogram in round 4 — 13.4 -> 9.8
ms/call standalone at sa1 scale, bitwise identical (TUNING.md).

Work skipping (the role of the CUDA kernel's per-thread early `break`):
  1. chunk compaction (the big one): tile-bbox x chunk-bbox overlap is
     computed OUTSIDE the kernel in XLA, and a scalar-prefetched per-tile
     chunk table reorders the chunk-slot grid dimension so overlapping chunks
     come first (ascending chunk id — hit order is preserved) and padding
     slots repeat the last real chunk. Mosaic skips the DMA when consecutive
     grid steps map to the same block, so non-overlapping chunks are never
     fetched OR tested — the kernel only ever sees real work. Centers are
     Morton-reordered inside the wrapper (pure reordering) so tiles are
     spatially tight, and the data pipeline emits Morton-ordered clouds
     (data/spatial.py) so chunks are too — together they make most tiles
     overlap only a few chunks.
  2. all-full skip: once every center in the tile has nsample hits the
     remaining chunks do nothing.
  3. no-hit chunks skip ranks + deposit; hit-free 128-lane windows skip
     their binary search.
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


# points per streamed chunk / centers per program. Swept on hardware at the
# sa1 scale (benchmarks/TUNING.md): 128x1024 beat 128x512 (20.2 vs 21.6 ms),
# 128x256 (33.4), 128x1536 (22.2), 256x512 (25.9); TILE=64 is invalid (lane
# dim must be 128-divisible).
_CHUNK = 1024
_TILE = 128


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
    tight, which is what arms the chunk compaction."""
    lo = jnp.min(pts, axis=1, keepdims=True)
    hi = jnp.max(pts, axis=1, keepdims=True)
    scale = jnp.where(hi > lo, 1023.0 / (hi - lo), 0.0)
    q = jnp.clip((pts - lo) * scale, 0, 1023).astype(jnp.uint32)
    return (_spread_bits_u32(q[..., 0]) | (_spread_bits_u32(q[..., 1]) << 1)
            | (_spread_bits_u32(q[..., 2]) << 2))


def _bq_kernel(radius: float, nsample: int, n_valid: int, emit_values: bool,
               feat_dim: int, tbl_ref, cnt_ref, x_ref, y_ref, z_ref,
               cx_ref, cy_ref, cz_ref, *rest):
    f_ref = None
    if feat_dim:  # implies emit_values
        (f_ref, out_ref, gx_ref, gy_ref, gz_ref, gf_ref,
         acc_ref, count_ref, col_ref, vx_ref, vy_ref, vz_ref,
         vf_ref) = rest
    elif emit_values:
        (out_ref, gx_ref, gy_ref, gz_ref,
         acc_ref, count_ref, col_ref, vx_ref, vy_ref, vz_ref) = rest
    else:
        out_ref, acc_ref, count_ref, col_ref = rest
    T = cx_ref.shape[-1]
    C = x_ref.shape[-1]
    r2 = radius * radius
    b = pl.program_id(0)
    st = pl.program_id(1)
    j = pl.program_id(2)
    nslots = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros((T, nsample), jnp.int32)
        count_ref[:] = jnp.zeros((T, 1), jnp.int32)
        if emit_values:
            vx_ref[:] = jnp.zeros((T, nsample), jnp.float32)
            vy_ref[:] = jnp.zeros((T, nsample), jnp.float32)
            vz_ref[:] = jnp.zeros((T, nsample), jnp.float32)
        if feat_dim:
            vf_ref[:] = jnp.zeros((T, nsample * feat_dim), jnp.float32)

    real = j < cnt_ref[b, st]
    not_full = jnp.min(count_ref[:]) < nsample

    @pl.when(real & not_full)
    def _():
        cx = cx_ref[0, 0, :].reshape(T, 1)
        cy = cy_ref[0, 0, :].reshape(T, 1)
        cz = cz_ref[0, 0, :].reshape(T, 1)
        px = x_ref[0, 0, :].reshape(1, C)
        py = y_ref[0, 0, :].reshape(1, C)
        pz = z_ref[0, 0, :].reshape(1, C)
        d2 = (cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2
        base = tbl_ref[b, st, j] * C
        gcols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1) + base
        mask = (d2 < r2) & (gcols < n_valid)

        @pl.when(jnp.any(mask))
        def _():
            count = count_ref[:]
            # inclusive prefix-sum along lanes as windowed MXU matmuls with
            # an upper-triangular ones matrix: 128-lane windows cut the
            # matmul FLOPs 8x vs one (C, C) triangle (rank values chain
            # across windows through a running row offset), and bf16
            # operands run the MXU at 2x — exact, since products are 0/1
            # and accumulation stays f32 (counts <= C fit bf16's 8-bit
            # mantissa times f32 accumulate)
            RW = 128
            rows = jax.lax.broadcasted_iota(jnp.int32, (RW, RW), 0)
            colsq = jax.lax.broadcasted_iota(jnp.int32, (RW, RW), 1)
            tri = (rows <= colsq).astype(jnp.bfloat16)
            maskf = mask.astype(jnp.bfloat16)
            offset = jnp.zeros((T, 1), jnp.float32)
            parts = []
            offsets = [offset]
            for w in range(C // RW):
                mw = maskf[:, w * RW:(w + 1) * RW]
                incl_w = jnp.dot(mw, tri,
                                 preferred_element_type=jnp.float32)
                parts.append(incl_w + offset)
                offset = offset + jnp.sum(
                    mw.astype(jnp.float32), axis=1, keepdims=True)
                offsets.append(offset)
            # --- searchsorted deposit (replaced the 64-section histogram:
            # 13.4 -> 9.8 ms/call standalone at sa1, bitwise identical;
            # TUNING.md round 4). incl is monotone per row, so the column of
            # a row's (r+1)-th hit is lower_bound(incl, r+1) — found with a
            # 7-step binary search whose probes are within-row lane shuffles
            # (tpu.dynamic_gather, the only gather Mosaic supports: one
            # (T, 128) vreg), walked per 128-lane window. Windows with no
            # hits skip the search. Rank lanes are the 128-wide vreg; ranks
            # >= nsample - count never fill a slot so 128 lanes always
            # suffice (nsample <= 128 asserted in the wrapper).
            RW2 = 128
            rank_lane = jax.lax.broadcasted_iota(jnp.int32, (T, RW2), 1)
            need_base = (rank_lane + 1).astype(jnp.float32)
            off2 = jnp.zeros((T, 1), jnp.float32)
            for w in range(C // RW2):
                off_next = offsets[w + 1]

                @pl.when(jnp.any(mask[:, w * RW2:(w + 1) * RW2]))
                def _(w=w, off2=off2, off_next=off_next):
                    linc_w = parts[w] - off2  # local inclusive counts
                    cnt_w = off_next - off2
                    need = need_base - off2
                    validr = (need >= 1.0) & (need <= cnt_w)
                    lo = jnp.zeros((T, RW2), jnp.int32)
                    for stp in (64, 32, 16, 8, 4, 2, 1):
                        probe = lo + (stp - 1)
                        g = jnp.take_along_axis(linc_w, probe, axis=1,
                                                mode="promise_in_bounds")
                        lo = lo + jnp.where(g < need, stp, 0)
                    col_ref[:] = jnp.where(validr, lo + w * RW2, col_ref[:])
                off2 = off_next
            new_count = count + jnp.sum(mask.astype(jnp.int32), axis=1,
                                        keepdims=True)
            # slot s (in [count, min(new_count, nsample))) takes the hit of
            # rank s - count; each slot is written exactly once across the
            # chunk stream (acc 0 = untouched, else global idx + 1)
            scols = jax.lax.broadcasted_iota(jnp.int32, (T, RW2), 1)
            fillable = ((scols >= count) & (scols < new_count)
                        & (scols < nsample))
            rank_needed = jnp.clip(scols - count, 0, RW2 - 1)
            col_slot = jnp.take_along_axis(col_ref[:], rank_needed, axis=1,
                                           mode="promise_in_bounds")
            dep = jnp.where(fillable, col_slot + base + 1, 0)
            acc_ref[:] = acc_ref[:] + dep[:, :nsample]

            if emit_values:
                # freshly-filled slots fetch their coordinates from the
                # chunk with the same windowed dynamic_gather; pltpu.repeat
                # materializes the (1, W) point plane into the (T, W)
                # operand shape (vector.broadcast and zeros+add both
                # canonicalize to a broadcast Mosaic rejects feeding
                # dynamic_gather — "Invalid input layout")
                W = 128
                fresh = fillable[:, :nsample]
                local = col_slot[:, :nsample]
                pad = jnp.zeros((T, W - nsample), jnp.int32)
                for w in range(C // W):
                    lw = local - w * W
                    inw = fresh & (lw >= 0) & (lw < W)

                    @pl.when(jnp.any(inw))
                    def _(w=w, lw=lw, inw=inw):
                        idxpad = jnp.concatenate(
                            [jnp.clip(lw, 0, W - 1), pad], axis=1)
                        for plane, ctr_col, ref in (
                                (px, cx, vx_ref), (py, cy, vy_ref),
                                (pz, cz, vz_ref)):
                            xw = pltpu.repeat(
                                plane[:, w * W:(w + 1) * W], T, axis=0)
                            g = jnp.take_along_axis(
                                xw, idxpad, axis=1,
                                mode="promise_in_bounds")[:, :nsample]
                            ref[:] = jnp.where(inw, g - ctr_col, ref[:])

            if feat_dim:
                # feature-row deposit on the MXU: per slot k, a one-hot
                # (T, C) selection matrix (row t picks the chunk column of
                # t's fresh hit for slot k) matmuls the resident feature
                # chunk (C, feat_dim). One-hot x value is EXACT in any
                # dtype (each output element is one product of value * 1
                # accumulated with zeros), so this is bitwise equal to the
                # XLA row-gather it replaces — at MXU throughput instead of
                # ~11.5 ns/row gather overhead (TUNING.md round 4).
                fk = f_ref[0]  # (C, feat_dim), original dtype
                ccols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
                for k in range(nsample):
                    onehot = (fresh[:, k:k + 1]
                              & (ccols == local[:, k:k + 1])).astype(fk.dtype)
                    dep_k = jnp.dot(onehot, fk,
                                    preferred_element_type=jnp.float32)
                    sl = slice(k * feat_dim, (k + 1) * feat_dim)
                    vf_ref[:, sl] = vf_ref[:, sl] + dep_k

            count_ref[:] = new_count

    @pl.when(j == nslots - 1)
    def _():
        acc = acc_ref[:]
        filled = acc > 0
        first = jnp.maximum(acc[:, 0:1] - 1, 0)
        out_ref[0] = jnp.where(filled, acc - 1, first)
        if emit_values:
            # unfilled slots duplicate the first hit (ball_query_gpu.cu:38-45)
            gx_ref[0] = jnp.where(filled, vx_ref[:], vx_ref[:, 0:1])
            gy_ref[0] = jnp.where(filled, vy_ref[:], vy_ref[:, 0:1])
            gz_ref[0] = jnp.where(filled, vz_ref[:], vz_ref[:, 0:1])
        if feat_dim:
            vf = vf_ref[:]
            f0 = vf[:, :feat_dim]
            for k in range(nsample):
                sl = slice(k * feat_dim, (k + 1) * feat_dim)
                gf_ref[0, :, sl] = jnp.where(
                    filled[:, k:k + 1], vf[:, sl], f0).astype(gf_ref.dtype)


def _chunk_tables(ctr, cb, radius, ntiles, nchunks):
    """Per-(batch, center-tile) compacted chunk schedule, in XLA.

    ctr: (B, Spad, 3) Morton-sorted centers (padding rows at 1e6)
    cb:  (B, nchunks, 6) per-chunk xyz bounds
    Returns tbl (B, ntiles, nchunks) i32 — overlapping chunk ids first in
    ascending order, then the last real id repeated (so the pipeline DMA is
    skipped) — and cnt (B, ntiles) i32."""
    B = ctr.shape[0]
    tiles = ctr.reshape(B, ntiles, -1, 3)
    real = tiles[..., 0] < 5e5
    big = jnp.float32(3e6)
    tlo = jnp.min(jnp.where(real[..., None], tiles, big), axis=2) - radius
    thi = jnp.max(jnp.where(real[..., None], tiles, -big), axis=2) + radius
    clo = cb[:, :, 0::2]  # (B, nchunks, 3)
    chi = cb[:, :, 1::2]
    overlap = jnp.all((clo[:, None] <= thi[:, :, None])
                      & (chi[:, None] >= tlo[:, :, None]), axis=-1)
    # overlapping chunks first, ascending id within each group
    order = jnp.argsort(~overlap, axis=-1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(overlap.astype(jnp.int32), axis=-1)
    # padding slots repeat the last real chunk id (cnt >= 1 is guaranteed for
    # tiles with real centers — a center is inside some chunk's bbox; for
    # all-padding tiles every slot points at chunk 0 and the body is skipped)
    last = jnp.take_along_axis(order, jnp.maximum(cnt - 1, 0)[..., None],
                               axis=-1)
    j = jnp.arange(nchunks, dtype=jnp.int32)
    tbl = jnp.where(j[None, None, :] < cnt[..., None], order, last)
    return tbl, cnt


def _bq_pallas(radius: float, nsample: int, xyz, new_xyz, emit_values: bool,
               features=None):
    assert nsample <= 128, "searchsorted deposit uses 128 rank lanes"
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    n_pad = (-N) % _CHUNK
    s_pad = (-S) % _TILE
    npad, spad = N + n_pad, S + s_pad

    pts = jnp.pad(xyz, ((0, 0), (0, n_pad), (0, 0)), constant_values=1e6)
    ctr = jnp.pad(new_xyz, ((0, 0), (0, s_pad), (0, 0)), constant_values=1e6)
    feat_dim = 0
    if features is not None:
        assert emit_values
        cf = features.shape[-1]
        feat_dim = cf + ((-cf) % 128)  # lane-pad the channel dim
        feats = jnp.pad(features, ((0, 0), (0, n_pad), (0, feat_dim - cf)))

    # Morton-order the centers (pure reordering; padding slots carry the
    # max key and collect at the end). Keys are computed on the UNPADDED
    # centers so the 1e6 padding sentinel cannot skew the quantization range.
    # (Hilbert keys were tried here — 41% tighter tile bboxes but measured
    # ~1 ms SLOWER end to end; the chunk extent dominates the overlap count.
    # See benchmarks/TUNING.md.)
    code = jnp.pad(_morton_code(new_xyz), ((0, 0), (0, s_pad)),
                   constant_values=jnp.uint32(0xFFFFFFFF))
    corder = jnp.argsort(code, axis=1)
    ctr = jnp.take_along_axis(ctr, corder[..., None], axis=1)

    # per-chunk xyz bounds + the compacted chunk schedule
    nchunks = npad // _CHUNK
    ntiles = spad // _TILE
    chunked = pts.reshape(B, nchunks, _CHUNK, 3)
    cb = jnp.stack([
        chunked[..., 0].min(-1), chunked[..., 0].max(-1),
        chunked[..., 1].min(-1), chunked[..., 1].max(-1),
        chunked[..., 2].min(-1), chunked[..., 2].max(-1),
    ], axis=-1)
    tbl, cnt = _chunk_tables(ctr, cb, radius, ntiles, nchunks)

    pts_t = pts.transpose(0, 2, 1)[:, :, None, :]  # (B,3,1,Npad)
    ctr_t = ctr.transpose(0, 2, 1)[:, :, None, :]

    pt_spec = pl.BlockSpec((1, 1, _CHUNK),
                           lambda b, st, j, tbl, cnt: (b, 0, tbl[b, st, j]),
                           memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((1, 1, _TILE),
                           lambda b, st, j, tbl, cnt: (b, 0, st),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, _TILE, nsample),
                          lambda b, st, j, tbl, cnt: (b, st, 0),
                          memory_space=pltpu.VMEM)
    i32_out = jax.ShapeDtypeStruct((B, spad, nsample), jnp.int32)
    f32_out = jax.ShapeDtypeStruct((B, spad, nsample), jnp.float32)
    scratch = [pltpu.VMEM((_TILE, nsample), jnp.int32),
               pltpu.VMEM((_TILE, 1), jnp.int32),
               pltpu.VMEM((_TILE, 128), jnp.int32)]  # searchsorted payload
    if emit_values:
        scratch += [pltpu.VMEM((_TILE, nsample), jnp.float32)] * 3
    in_specs = [pt_spec] * 3 + [ct_spec] * 3
    out_specs = (o_spec, o_spec, o_spec, o_spec) if emit_values else o_spec
    out_shape = ((i32_out, f32_out, f32_out, f32_out) if emit_values
                 else i32_out)
    operands = [pts_t[:, 0], pts_t[:, 1], pts_t[:, 2],
                ctr_t[:, 0], ctr_t[:, 1], ctr_t[:, 2]]
    if feat_dim:
        in_specs = in_specs + [pl.BlockSpec(
            (1, _CHUNK, feat_dim),
            lambda b, st, j, tbl, cnt: (b, tbl[b, st, j], 0),
            memory_space=pltpu.VMEM)]
        operands.append(feats)
        gf_spec = pl.BlockSpec((1, _TILE, nsample * feat_dim),
                               lambda b, st, j, tbl, cnt: (b, st, 0),
                               memory_space=pltpu.VMEM)
        out_specs = out_specs + (gf_spec,)
        out_shape = out_shape + (jax.ShapeDtypeStruct(
            (B, spad, nsample * feat_dim), features.dtype),)
        scratch.append(pltpu.VMEM((_TILE, nsample * feat_dim), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tbl, cnt in SMEM
        grid=(B, ntiles, nchunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_bq_kernel, float(radius), int(nsample), N,
                          emit_values, feat_dim),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(tbl, cnt, *operands)
    # un-permute centers back to caller order
    inv = jnp.argsort(corder, axis=1)[..., None]
    if feat_dim:
        idx, gx, gy, gz, gf = out
        idx = jnp.take_along_axis(idx, inv, axis=1)[:, :S]
        grouped = jnp.stack([jnp.take_along_axis(v, inv, axis=1)[:, :S]
                             for v in (gx, gy, gz)], axis=-1)
        gf = jnp.take_along_axis(gf, inv, axis=1)[:, :S]
        gf = gf.reshape(B, S, nsample, feat_dim)[..., :features.shape[-1]]
        return idx, grouped, gf
    if emit_values:
        idx, gx, gy, gz = out
        idx = jnp.take_along_axis(idx, inv, axis=1)[:, :S]
        grouped = jnp.stack([jnp.take_along_axis(v, inv, axis=1)[:, :S]
                             for v in (gx, gy, gz)], axis=-1)
        return idx, grouped
    return jnp.take_along_axis(out, inv, axis=1)[:, :S]


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array,
               new_xyz: jax.Array) -> jax.Array:
    """(B,N,3) points x (B,S,3) centers -> (B,S,nsample) int32 neighbor idx.

    Bitwise-identical to ball_query_ref."""
    # non-differentiable (BallQuery autograd Function has no backward)
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)
    if xyz.shape[1] * new_xyz.shape[1] <= 256 * 1024:
        return ball_query_ref(radius, nsample, xyz, new_xyz)
    return _bq_pallas(radius, nsample, xyz, new_xyz, False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ball_query_group(radius: float, nsample: int, xyz: jax.Array,
                     new_xyz: jax.Array):
    """Fused ball query + relative-xyz grouping.

    (B,N,3) points x (B,S,3) centers -> (idx (B,S,nsample) i32,
    grouped (B,S,nsample,3) f32) where grouped == xyz[idx] - new_xyz[:,:,None]
    — the QueryAndGroup composition (pointnet2_utils.py:294-352) without the
    XLA row-gather (measured 11.5 ns/row = 9 ms/step at sa1; the kernel
    deposits the values while the point chunk is already in VMEM).

    A center with no in-radius hit yields idx row 0s and grouped rows
    xyz[0] - center — the reference CUDA padding semantics (the zero-
    initialized idx buffer reads point 0, ball_query_gpu.cu:38-45). The
    custom VJP routes those rows' cotangents to xyz[0]/center accordingly.
    """
    idxg = _ball_query_group_fwd_impl(radius, nsample, xyz, new_xyz)
    return idxg


def _ball_query_group_fwd_impl(radius, nsample, xyz, new_xyz):
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    if xyz.shape[1] * new_xyz.shape[1] <= 256 * 1024:
        idx = ball_query_ref(radius, nsample, jax.lax.stop_gradient(xyz),
                             jax.lax.stop_gradient(new_xyz))
        flat = jnp.take_along_axis(
            xyz, idx.reshape(idx.shape[0], -1)[..., None], axis=1)
        return idx, flat.reshape(idx.shape + (3,)) - new_xyz[:, :, None, :]
    idx, grouped = _bq_pallas(radius, nsample, jax.lax.stop_gradient(xyz),
                              jax.lax.stop_gradient(new_xyz), True)
    # The kernel deposits 0 for empty slots; a center with NO hit leaves its
    # whole row empty where the reference reads xyz[0] (zero-initialized idx
    # buffer, ball_query_gpu.cu:38-45). Patch those rows so the fused op is
    # drop-in equal to ball_query + group_points for every input (a real hit
    # at index 0 is distinguished by point 0 being inside the ball).
    rel0 = xyz[:, :1] - new_xyz  # (B, S, 3): xyz[0] - center
    no_hit = (jnp.all(idx == 0, axis=-1)
              & (jnp.sum(rel0 * rel0, axis=-1) >= radius * radius))
    grouped = jnp.where(no_hit[..., None, None], rel0[:, :, None, :], grouped)
    return idx, grouped


def _bqg_fwd(radius, nsample, xyz, new_xyz):
    idx, grouped = _ball_query_group_fwd_impl(radius, nsample, xyz, new_xyz)
    return (idx, grouped), (idx, xyz.shape)


def _bqg_bwd(radius, nsample, res, cot):
    idx, xyz_shape = res
    _, g = cot  # cotangent of (idx, grouped); idx is int (no tangent)
    B, S, K = idx.shape
    # grouped = xyz[idx] - new_xyz  =>  d xyz = scatter-add(g), d new = -sum_k g
    flat_idx = idx.reshape(B, S * K)
    flat_g = g.reshape(B, S * K, 3)
    dxyz = jnp.zeros(xyz_shape, flat_g.dtype)
    dxyz = jax.vmap(lambda z, i, v: z.at[i].add(v))(dxyz, flat_idx, flat_g)
    dnew = -jnp.sum(g, axis=2)
    return dxyz, dnew


ball_query_group.defvjp(_bqg_fwd, _bqg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ball_query_group_feats(radius: float, nsample: int, xyz: jax.Array,
                           new_xyz: jax.Array, features: jax.Array):
    """Fused ball query + relative-xyz grouping + feature-row grouping.

    (B,N,3) points x (B,S,3) centers x (B,N,C) features ->
    (idx (B,S,nsample) i32, grouped_xyz (B,S,nsample,3) f32,
     grouped_feats (B,S,nsample,C) features.dtype) where
    grouped_feats == features[idx] — the full QueryAndGroup composition
    (pointnet2_utils.py:294-352) with use_xyz's feature gather folded into
    the kernel: the feature rows are deposited by per-slot one-hot MXU
    matmuls against the chunk already resident in VMEM, replacing the XLA
    row-gather (~11.5 ns/row; the sa2/sa3 take_along fusions were ~4.5
    ms/step of the round-4 94 ms train step). Bitwise equal to
    group_points(features, idx) — one-hot x value is exact in any dtype.

    No-hit centers follow the reference padding semantics (idx row 0s):
    grouped_xyz rows are xyz[0] - center, grouped_feats rows features[0]
    (zero-initialized idx buffer, ball_query_gpu.cu:38-45).
    """
    return _bqg_feats_fwd_impl(radius, nsample, xyz, new_xyz, features)


def _bqg_feats_fwd_impl(radius, nsample, xyz, new_xyz, features):
    from .interpolate import group_points
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    if xyz.shape[1] * new_xyz.shape[1] <= 256 * 1024:
        idx = ball_query_ref(radius, nsample, jax.lax.stop_gradient(xyz),
                             jax.lax.stop_gradient(new_xyz))
        flat = jnp.take_along_axis(
            xyz, idx.reshape(idx.shape[0], -1)[..., None], axis=1)
        grouped = flat.reshape(idx.shape + (3,)) - new_xyz[:, :, None, :]
        return idx, grouped, group_points(features, idx)
    idx, grouped, gf = _bq_pallas(
        radius, nsample, jax.lax.stop_gradient(xyz),
        jax.lax.stop_gradient(new_xyz), True,
        features=jax.lax.stop_gradient(features))
    # no-hit rows: the kernel leaves zeros where the reference reads row 0
    # (same patch as _ball_query_group_fwd_impl, extended to features)
    rel0 = xyz[:, :1] - new_xyz  # (B, S, 3)
    no_hit = (jnp.all(idx == 0, axis=-1)
              & (jnp.sum(rel0 * rel0, axis=-1) >= radius * radius))
    grouped = jnp.where(no_hit[..., None, None], rel0[:, :, None, :], grouped)
    gf = jnp.where(no_hit[..., None, None], features[:, :1][:, :, None], gf)
    return idx, grouped, gf


def _bqg_feats_fwd(radius, nsample, xyz, new_xyz, features):
    out = _bqg_feats_fwd_impl(radius, nsample, xyz, new_xyz, features)
    idx = out[0]
    return out, (idx, xyz.shape, features.shape)


def _bqg_feats_bwd(radius, nsample, res, cot):
    idx, xyz_shape, feat_shape = res
    _, g, gf = cot
    B, S, K = idx.shape
    flat_idx = idx.reshape(B, S * K)
    # grouped_xyz = xyz[idx] - new_xyz, grouped_feats = features[idx]
    dxyz = jnp.zeros(xyz_shape, g.dtype)
    dxyz = jax.vmap(lambda z, i, v: z.at[i].add(v))(
        dxyz, flat_idx, g.reshape(B, S * K, 3))
    dnew = -jnp.sum(g, axis=2)
    dfeat = jnp.zeros(feat_shape, gf.dtype)
    dfeat = jax.vmap(lambda z, i, v: z.at[i].add(v))(
        dfeat, flat_idx, gf.reshape(B, S * K, feat_shape[-1]))
    return dxyz, dnew, dfeat


ball_query_group_feats.defvjp(_bqg_feats_fwd, _bqg_feats_bwd)
