"""Fused SharedMLP + max-pool over grouped point neighborhoods (Pallas).

The SA layers' Dense->BN(batch stats)->ReLU chains over (B, S, K, C) are the
train step's largest HBM consumers: XLA materializes every layer's
activations to HBM (a matmul operand cannot stay fused into its producer),
and train-mode BatchNorm adds a full stats-reduction pass per layer. At the
round-4 operating point the step rode the HBM roofline at 87.6% utilization
with the remaining order-of-magnitude byte cut identified as exactly these
materializations (benchmarks/ROOFLINE.md).

This kernel trades FLOPs for bytes: a (L+1)-phase grid where phase i
recomputes the chain up to layer i from the (small) grouped input resident
in VMEM and accumulates layer i's BN batch statistics (sum, sum-of-squares)
into a VMEM-resident accumulator, and the final phase runs the whole chain
plus the K-neighborhood max-pool, writing only the pooled (B, S, C_last)
output. HBM traffic = (L+1) reads of the grouped input + one pooled write,
instead of ~2 reads + 2 writes of every (B, S, K, C_i) intermediate. The
matmul recompute is ~3.3x single-chain FLOPs -- cheap on the MXU at the
step's 24 FLOPs/byte arithmetic intensity (ridge ~240).

Numerics mirror flax SharedMLP (models/pointnet2.py) op for op:
  a    = dot(h_bf16, W_bf16)            # f32 MXU accum, rounded to dtype
  af   = a.astype(dtype).astype(f32)    # flax BN promotes the Dense output
  mu   = sum(af)/N ; var = max(0, sum(af^2)/N - mu^2)   # fast variance
  y    = (af - mu) * (rsqrt(var+eps) * scale) + bias    # f32, like flax
  h    = relu(y.astype(dtype))
Only the stats reduction ORDER differs (per-tile partial sums vs one global
tree sum) -- an f32-roundoff-level difference.

Backward: custom VJP that recomputes the plain jnp chain (plain_mlp_pool)
and backprops through it -- i.e. rematerialization, but with the forward's
HBM traffic already removed. plain_mlp_pool is BITWISE the flax SharedMLP
forward (tests/test_fused_mlp.py::test_oracle_is_sharedmlp_bitwise); its
gradients agree with flax's to reassociation ulp (flax associates the BN
affine differently in its backward).

Reference hot path being replaced: pointnet2/pytorch_utils.py:11-37
(SharedMLP) + pointnet2_modules.py:164-272 (PointnetSAModuleVotes max-pool).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# conservative VMEM budget per grid step (bytes); Mosaic double-buffers the
# input block and keeps every live intermediate of the deepest phase
_VMEM_BUDGET = 8 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class _Cfg(NamedTuple):
    """Hashable static config for the custom_vjp primal."""
    channels: Tuple[int, ...]
    train: bool
    eps: float
    dtype: str


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plain_mlp_pool(grouped, kernels, scales, biases, ra_means, ra_vars,
                   train: bool, eps: float, dtype):
    """The unfused oracle: flax-SharedMLP-equivalent jnp chain + K max-pool.

    grouped (B, S, K, C0); kernels[i] (C_{i-1}, C_i) f32; scales/biases (C,)
    f32; ra_* used when not train. Returns (pooled (B,S,C_L) dtype,
    means tuple, vars tuple) -- means/vars are the batch statistics (train)
    or () (eval). Semantics match SharedMLP (models/pointnet2.py) /
    flax nn.Dense + nn.BatchNorm exactly; this is both the custom-VJP
    recompute target and the test oracle for the Pallas kernel.
    """
    dt = jnp.dtype(dtype)
    x = grouped.astype(dt)
    means, variances = [], []
    for i, w in enumerate(kernels):
        a = jnp.matmul(x, w.astype(dt))          # flax Dense: dtype compute
        af = a.astype(jnp.float32)               # flax BN f32 promotion
        if train:
            mu = jnp.mean(af, axis=(0, 1, 2))
            mu2 = jnp.mean(af * af, axis=(0, 1, 2))
            var = jnp.maximum(0.0, mu2 - mu * mu)
            means.append(mu)
            variances.append(var)
        else:
            mu, var = ra_means[i], ra_vars[i]
        mul = jax.lax.rsqrt(var + eps) * scales[i]
        y = (af - mu) * mul + biases[i]
        x = jnp.maximum(y.astype(dt), 0)
    return jnp.max(x, axis=2), tuple(means), tuple(variances)


def _pick_tile(K: int, C0: int, channels: Sequence[int], itemsize: int,
               n_rows: int) -> int:
    """Rows-of-output per grid step (TR), sized to the VMEM budget."""
    c0p = _round_up(max(C0, 1), _LANE)
    # per grouped row (K points): input block (x2 double buffer) + per layer
    # an f32 pre-activation and a dtype activation
    per_row = K * (2 * c0p * itemsize + sum(4 * c + itemsize * c
                                            for c in channels))
    tr = _VMEM_BUDGET // max(per_row, 1)
    tr = max(8, min(1 << (tr.bit_length() - 1) if tr > 0 else 8, 512))
    return min(tr, _round_up(n_rows, 8))


def _make_kernel(L, K, TR, n_valid, dt, train, inv_n, eps, mask_rows):
    """Build the (L+1)-phase train kernel or the single-phase eval kernel."""
    f32 = jnp.float32

    def _bn_relu(af, mu, var, s_ref, b_ref):
        mul = jax.lax.rsqrt(var + eps) * s_ref[:]
        return jnp.maximum(((af - mu) * mul + b_ref[:]).astype(dt), 0)

    def kernel(*refs):
        if train:
            x_ref = refs[0]
            w = refs[1:1 + L]
            s = refs[1 + L:1 + 2 * L]
            b = refs[1 + 2 * L:1 + 3 * L]
            out_ref = refs[1 + 3 * L]
            st = refs[2 + 3 * L:2 + 4 * L]
            p = pl.program_id(0)
            t = pl.program_id(1)

            @pl.when(jnp.logical_and(p == 0, t == 0))
            def _():
                for r in st:
                    r[:] = jnp.zeros_like(r)

            if mask_rows:
                base = t * (TR * K)
                rows = jax.lax.broadcasted_iota(jnp.int32, (TR * K, 1), 0)
                valid = ((rows + base) < n_valid).astype(f32)

            def _acc(i, af):
                @pl.when(p == i)
                def _():
                    m = af * valid if mask_rows else af
                    m2 = (af * af) * valid if mask_rows else af * af
                    st[i][0:1, :] += jnp.sum(m, axis=0, keepdims=True)
                    st[i][1:2, :] += jnp.sum(m2, axis=0, keepdims=True)

            def _chain(i, h):
                a = jnp.dot(h, w[i][:], preferred_element_type=f32)
                af = a.astype(dt).astype(f32)
                _acc(i, af)

                @pl.when(p >= i + 1)
                def _():
                    mu = st[i][0:1, :] * inv_n
                    var = jnp.maximum(
                        0.0, st[i][1:2, :] * inv_n - mu * mu)
                    hh = _bn_relu(af, mu, var, s[i], b[i])
                    if i == L - 1:
                        cl = hh.shape[-1]
                        out_ref[:] = jnp.max(
                            hh.reshape(TR, K, cl), axis=1)
                    else:
                        _chain(i + 1, hh)

            _chain(0, x_ref[:])
        else:
            x_ref = refs[0]
            w = refs[1:1 + L]
            s = refs[1 + L:1 + 2 * L]
            b = refs[1 + 2 * L:1 + 3 * L]
            m = refs[1 + 3 * L:1 + 4 * L]
            v = refs[1 + 4 * L:1 + 5 * L]
            out_ref = refs[1 + 5 * L]
            h = x_ref[:]
            for i in range(L):
                a = jnp.dot(h, w[i][:], preferred_element_type=f32)
                af = a.astype(dt).astype(f32)
                h = _bn_relu(af, m[i][:], v[i][:], s[i], b[i])
            cl = h.shape[-1]
            out_ref[:] = jnp.max(h.reshape(TR, K, cl), axis=1)

    return kernel


def _forward_pallas(cfg: _Cfg, grouped, kernels, scales, biases,
                    ra_means, ra_vars):
    B, S, K, C0 = grouped.shape
    chans = cfg.channels
    L = len(chans)
    CL = chans[-1]
    dt = jnp.dtype(cfg.dtype)
    R = B * S
    N = R * K

    TR = _pick_tile(K, C0, chans, dt.itemsize, R)
    Rp = _round_up(R, TR)
    T = Rp // TR
    mask_rows = Rp != R

    x = grouped.astype(dt).reshape(R * K, C0)
    if mask_rows:
        x = jnp.pad(x, ((0, (Rp - R) * K), (0, 0)))

    w_in = [k.astype(dt) for k in kernels]
    s_in = [s.astype(jnp.float32).reshape(1, -1) for s in scales]
    b_in = [b.astype(jnp.float32).reshape(1, -1) for b in biases]

    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    inv_n = float(1.0 / N)

    kern = _make_kernel(L, K, TR, N, dt, cfg.train, inv_n, cfg.eps,
                        mask_rows)
    # one full chain is 2*N*sum(C_in*C_out) MACs; the multi-phase schedule
    # reruns the prefix, ~(L+3)/2-plus-one-ish chains total
    chain_flops = 2 * N * sum(a * b for a, b in
                              zip((C0,) + tuple(chans[:-1]), chans))

    if cfg.train:
        grid = (L + 1, T)
        in_specs = ([pl.BlockSpec((TR * K, C0), lambda p, t: (t, 0),
                                  memory_space=pltpu.VMEM)]
                    + [const] * (3 * L))
        out_shape = ([jax.ShapeDtypeStruct((Rp, CL), dt)]
                     + [jax.ShapeDtypeStruct((8, c), jnp.float32)
                        for c in chans])
        out_specs = ([pl.BlockSpec((TR, CL), lambda p, t: (t, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((8, c), lambda p, t: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for c in chans])
        res = pl.pallas_call(
            kern, grid=grid,
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=int(chain_flops * (L + 4) / 2),
                bytes_accessed=(L + 1) * x.size * dt.itemsize
                + Rp * CL * dt.itemsize,
                transcendentals=0),
            interpret=_interpret(),
        )(x, *w_in, *s_in, *b_in)
        pooled = res[0][:R].reshape(B, S, CL)
        means, variances = [], []
        for st in res[1:]:
            mu = st[0] * jnp.float32(inv_n)
            var = jnp.maximum(0.0, st[1] * jnp.float32(inv_n) - mu * mu)
            means.append(mu)
            variances.append(var)
        return pooled, tuple(means), tuple(variances)

    m_in = [m.astype(jnp.float32).reshape(1, -1) for m in ra_means]
    v_in = [v.astype(jnp.float32).reshape(1, -1) for v in ra_vars]
    out = pl.pallas_call(
        kern, grid=(T,),
        in_specs=([pl.BlockSpec((TR * K, C0), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)]
                  + [const] * (5 * L)),
        out_specs=pl.BlockSpec((TR, CL), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, CL), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=int(chain_flops),
            bytes_accessed=x.size * dt.itemsize + Rp * CL * dt.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(x, *w_in, *s_in, *b_in, *m_in, *v_in)
    return out[:R].reshape(B, S, CL), (), ()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg: _Cfg, grouped, kernels, scales, biases, ra_means, ra_vars):
    return _forward_pallas(cfg, grouped, kernels, scales, biases,
                           ra_means, ra_vars)


def _fused_fwd(cfg, grouped, kernels, scales, biases, ra_means, ra_vars):
    out = _forward_pallas(cfg, grouped, kernels, scales, biases,
                          ra_means, ra_vars)
    return out, (grouped, kernels, scales, biases, ra_means, ra_vars)


def _fused_bwd(cfg, res, ct):
    """Rematerializing backward: vjp through the plain jnp chain. Gradients
    are exactly those of the unfused SharedMLP path (same ops, same stats
    graph); running statistics are buffers and receive zero cotangent, like
    the reference's torch BN."""
    grouped, kernels, scales, biases, ra_means, ra_vars = res

    def f(g, ks, ss, bs):
        return plain_mlp_pool(g, ks, ss, bs, ra_means, ra_vars,
                              cfg.train, cfg.eps, jnp.dtype(cfg.dtype))

    _, vjp = jax.vjp(f, grouped, kernels, scales, biases)
    dg, dk, ds, db = vjp(ct)
    zm = tuple(jnp.zeros_like(m) for m in ra_means)
    zv = tuple(jnp.zeros_like(v) for v in ra_vars)
    return dg, dk, ds, db, zm, zv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_pool(grouped, kernels, scales, biases, ra_means=(),
                   ra_vars=(), *, train: bool, eps: float = 1e-5,
                   dtype=jnp.float32):
    """Fused SharedMLP(channels)+BN+ReLU chain and K-axis max-pool.

    grouped (B, S, K, C0) -> (pooled (B, S, channels[-1]) in `dtype`,
    batch means tuple, batch vars tuple). In eval mode (train=False) the
    provided running statistics are used and the stats tuples come back
    empty. Gradients flow to grouped/kernels/scales/biases (not to the
    running stats). All shapes static; K and the channel widths should be
    TPU-tile friendly (K a multiple of 8 -- 16 for bfloat16 -- and channels
    multiples of 128); callers gate on `supports()`.
    """
    cfg = _Cfg(tuple(int(c) for c in (k.shape[1] for k in kernels)),
               bool(train), float(eps), jnp.dtype(dtype).name)
    return _fused(cfg, grouped, tuple(kernels), tuple(scales),
                  tuple(biases), tuple(ra_means), tuple(ra_vars))


def supports(K: int, channels: Sequence[int], dtype) -> bool:
    """Static gate for the fused path: TPU tiling constraints on the
    in-kernel (TR*K, C) <-> (TR, K, C) reshape and the MXU-friendly channel
    widths. float64 (the numerics-validation design point) and odd widths
    (e.g. vote_aggregation's 288) fall back to the unfused SharedMLP."""
    dt = jnp.dtype(dtype)
    if dt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    sub = 16 if dt == jnp.dtype(jnp.bfloat16) else 8
    return K % sub == 0 and all(c % _LANE == 0 for c in channels)
