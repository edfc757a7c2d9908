"""Furthest point sampling as a TPU Pallas kernel.

Reference semantics: pointnet2/_ext_src/src/sampling_gpu.cu:74-234 (one CUDA
block per batch row, shared-memory argmax reduction, seeds index 0, skips
points with ||p||^2 <= 1e-3). The TPU design vectorizes over the batch in the
sublane dimension and over points in the lane dimension: the running
min-distance state lives in VMEM scratch and each of the `npoint` steps is a
handful of (B, N) VPU passes plus a lane-reduction argmax.

The inherently sequential selection loop runs as the second GRID dimension
rather than a lax.fori_loop — Mosaic pipelines grid steps at ~zero overhead
while a fori_loop iteration costs ~20us in loop machinery (measured), a 5x
difference at npoint=2048. Scratch (min-dist, last index) persists across
grid steps and resets at step 0; the selected index is deposited into the
output row with a one-hot accumulate (per-row dynamic lane stores are not a
TPU primitive).

Layout: each batch row's N points are split across all 8 sublanes of the
vector registers as (B, 8, N/8) — original index = sublane*L + lane. With
points only in the lane dimension a B=6 call left 2/8 sublanes idle on
every VPU pass; the packed layout runs the same per-element arithmetic on
~24% fewer vector registers (measured 11.2 -> 6.7 ms/call at sa1 scale on
a chained-call harness; full step 110.4 -> 101.4 ms). All reductions here
are exact under reordering (one-hot dot products have a single nonzero;
min/max are associative+commutative), so interpret-mode results are
bit-identical to the unpacked layout; hardware FMA grouping may differ,
with the same 0-2/512 tail-tie-flip envelope as before (see below).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import FPS_SKIP_NORM_SQ, fps_ref

_LANE = 128
_SUB = 8  # sublanes per vreg; the point dim is split (B, N) -> (B, 8, N/8)
# max batch rows per kernel invocation; keeps VMEM under ~8MB at N=40k
_MAX_ROWS = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, last_ref, col_ref):
    B, S, L = x_ref.shape
    npoint = pl.num_programs(0)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        x, y, z = x_ref[:], y_ref[:], z_ref[:]
        # hoisted loop invariants: the original-index map of the packed
        # layout, and the padding/origin-skip mask (from |p|^2, used only
        # here) folded into the initial min-dist sign bias
        pn = x * x + y * y + z * z
        sub = jax.lax.broadcasted_iota(jnp.int32, (B, S, L), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, S, L), 2)
        col_ref[:] = sub * L + lane
        # validity folded into the initial min-dist: invalid (near-origin /
        # padding) lanes start at -1 and min() keeps them there (d >= ~0), so
        # they can never win the argmax — no per-step masking needed
        mind_ref[:] = jnp.where(pn > FPS_SKIP_NORM_SQ, 1e10, -1.0)
        last_ref[:] = jnp.zeros((B, 1, 1), jnp.int32)
        out_ref[:] = jnp.zeros((B, 1, npoint), dtype=jnp.int32)

    @pl.when(i > 0)
    def _():
        x, y, z = x_ref[:], y_ref[:], z_ref[:]
        cols = col_ref[:]
        # extract the previously selected point's coords with a one-hot
        # reduction — exactly one lane matches, so the two-stage (lane,
        # sublane) sum is exact. (Tried and rejected: per-row 128-aligned
        # dynamic lane slices + 128-wide select — measured SLOWER, 9.2 vs
        # 8.4 ms at sa1; the scalar-driven slices serialize.)
        #
        # Exactness note: the distance MUST be the direct |p - c|^2 in the
        # oracle's evaluation order. The algebraic rearrangement
        # |p|^2 - 2 p.c + |c|^2 (one fewer pass, |p|^2 hoisted) rounds
        # differently and flips argmax near-ties — found at shape
        # (2, 5000) step 393 in INTERPRET mode, i.e. the rearrangement
        # alone breaks the bitwise gate, not just hardware FMA (the same
        # lesson as the rejected MXU distance form in ball_query,
        # benchmarks/TUNING.md). Hardware can still show 0-2/512 tail
        # tie-flips from FMA contraction, like the reference's own CUDA
        # reduction-order tie-breaks (sampling_gpu.cu:79-177).
        last = last_ref[:]
        onehot = (cols == last).astype(jnp.float32)

        def _extract(p):
            t = jnp.sum(p * onehot, axis=2, keepdims=True)
            return jnp.sum(t, axis=1, keepdims=True)

        cx, cy, cz = _extract(x), _extract(y), _extract(z)
        dx, dy, dz = x - cx, y - cy, z - cz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        m = jnp.max(jnp.max(mind, axis=2, keepdims=True), axis=1,
                    keepdims=True)
        cand = jnp.where(mind >= m, cols, S * L)
        nxt = jnp.min(jnp.min(cand, axis=2, keepdims=True), axis=1,
                      keepdims=True).astype(jnp.int32)
        last_ref[:] = nxt
        # deposit the selected index with a one-hot accumulate
        ocols = jax.lax.broadcasted_iota(jnp.int32, (B, 1, npoint), 2)
        out_ref[:] = out_ref[:] + nxt * (ocols == i).astype(jnp.int32)


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
    n_pad = (-N) % (_LANE * _SUB)
    planes = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad), (0, 0)))
    planes = planes.transpose(0, 2, 1)  # (B, 3, Npad)
    npad = N + n_pad
    lanes = npad // _SUB

    def run(chunk):  # (Bc, 3, Npad)
        bc = chunk.shape[0]
        spec = pl.BlockSpec((bc, _SUB, lanes), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _fps_kernel,
            grid=(npoint,),
            out_shape=jax.ShapeDtypeStruct((bc, 1, npoint), jnp.int32),
            in_specs=[spec] * 3,
            out_specs=pl.BlockSpec((bc, 1, npoint), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bc, _SUB, lanes), jnp.float32),
                            pltpu.VMEM((bc, 1, 1), jnp.int32),
                            pltpu.VMEM((bc, _SUB, lanes), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(chunk[:, 0].reshape(bc, _SUB, lanes),
          chunk[:, 1].reshape(bc, _SUB, lanes),
          chunk[:, 2].reshape(bc, _SUB, lanes))
        return out[:, 0]

    if B <= _MAX_ROWS:
        return run(planes)
    # split the batch to bound VMEM; remainder handled by padding rows with 0s
    b_pad = (-B) % _MAX_ROWS
    planes = jnp.pad(planes, ((0, b_pad), (0, 0), (0, 0)))
    chunks = planes.reshape(-1, _MAX_ROWS, 3, npad)
    out = jax.lax.map(run, chunks).reshape(-1, npoint)
    return out[:B]
