"""Fused SA-MLP kernel (ops/fused_mlp.py) vs the unfused SharedMLP path.

Three layers of guarantee, mirroring the other kernel suites:
  1. plain_mlp_pool (the oracle / VJP-recompute target) is BITWISE the flax
     SharedMLP + max-pool chain — so "gradients are the unfused path's" is a
     checkable claim, not prose.
  2. the Pallas kernel (interpret mode on CPU) matches the oracle to f32
     stats-reduction-order roundoff, train and eval, f32 and bf16, with and
     without row padding.
  3. the custom VJP is bitwise the plain chain's VJP (same cotangents in,
     same gradients out), and FusedMLPPool's param/batch_stats trees are
     drop-in interchangeable with SharedMLP's.

Reference hot path being replaced: pointnet2/pytorch_utils.py:11-37 +
pointnet2_modules.py:164-272 (SharedMLP stacks inside PointnetSAModuleVotes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omni_pq_tpu.models.pointnet2 import (BN_EPS, BN_MOMENTUM, FusedMLPPool,
                                          SharedMLP)
from omni_pq_tpu.ops import fused_mlp

CHANS = (128, 256)


def _params(key, c0, chans=CHANS):
    ks, ss, bs, rm, rv = [], [], [], [], []
    cin = c0
    for i, c in enumerate(chans):
        ks.append(0.1 * jax.random.normal(jax.random.fold_in(key, i),
                                          (cin, c)))
        ss.append(1.0 + 0.1 * jax.random.normal(
            jax.random.fold_in(key, 10 + i), (c,)))
        bs.append(0.1 * jax.random.normal(jax.random.fold_in(key, 20 + i),
                                          (c,)))
        rm.append(0.05 * jax.random.normal(jax.random.fold_in(key, 30 + i),
                                           (c,)))
        rv.append(1.0 + 0.2 * jax.random.uniform(
            jax.random.fold_in(key, 40 + i), (c,)))
        cin = c
    return ks, ss, bs, rm, rv


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5),
                                       (jnp.bfloat16, 0.13)])
@pytest.mark.parametrize("shape", [(2, 24, 16, 4),   # even tiles
                                   (1, 9, 16, 3)])   # padded rows (R=9)
def test_kernel_matches_oracle(train, dtype, tol, shape):
    B, S, K, C0 = shape
    key = jax.random.PRNGKey(0)
    ks, ss, bs, rm, rv = _params(key, C0)
    g = jax.random.normal(jax.random.fold_in(key, 99), (B, S, K, C0))

    po, mo, vo = fused_mlp.plain_mlp_pool(g, ks, ss, bs, rm, rv, train,
                                          BN_EPS, dtype)
    pf, mf, vf = fused_mlp.fused_mlp_pool(g, ks, ss, bs, rm, rv, train=train,
                                          eps=BN_EPS, dtype=dtype)
    assert pf.dtype == jnp.dtype(dtype)
    np.testing.assert_allclose(np.asarray(pf, np.float32),
                               np.asarray(po, np.float32), atol=tol)
    if train:
        # batch statistics: reduction order is the only difference
        for a, b in zip(mf, mo):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
        for a, b in zip(vf, vo):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)
    else:
        assert mf == () and vf == ()


@pytest.mark.parametrize("train", [True, False])
def test_vjp_bitwise_plain_chain(train):
    """Same cotangents in -> bitwise the plain (= SharedMLP) gradients out."""
    B, S, K, C0 = 2, 24, 16, 4
    key = jax.random.PRNGKey(1)
    ks, ss, bs, rm, rv = _params(key, C0)
    g = jax.random.normal(jax.random.fold_in(key, 99), (B, S, K, C0))

    def lf(g, ks, ss, bs):
        p, _, _ = fused_mlp.fused_mlp_pool(g, ks, ss, bs, rm, rv,
                                           train=train, dtype=jnp.float32)
        return jnp.sum(jnp.sin(p))

    def lo(g, ks, ss, bs):
        p, _, _ = fused_mlp.plain_mlp_pool(g, ks, ss, bs, rm, rv, train,
                                           BN_EPS, jnp.float32)
        return jnp.sum(jnp.sin(p))

    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(g, ks, ss, bs)
    go = jax.grad(lo, argnums=(0, 1, 2, 3))(g, ks, ss, bs)
    # the fused forward differs from plain at stats-order roundoff (~1e-5),
    # so sin's local slope (the cotangent) differs by the same amount; the
    # nonlinear-loss comparison is therefore tolerance-bounded by the
    # forward diff, not by the VJP (which the constant-cotangent check below
    # pins bitwise)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-4)

    # constant cotangent: literally bitwise
    gf1 = jax.grad(lambda *a: jnp.sum(fused_mlp.fused_mlp_pool(
        *a, rm, rv, train=train, dtype=jnp.float32)[0]),
        argnums=(0, 1, 2, 3))(g, ks, ss, bs)
    go1 = jax.grad(lambda *a: jnp.sum(fused_mlp.plain_mlp_pool(
        *a, rm, rv, train, BN_EPS, jnp.float32)[0]),
        argnums=(0, 1, 2, 3))(g, ks, ss, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gf1),
                    jax.tree_util.tree_leaves(go1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_oracle_is_sharedmlp_bitwise():
    """plain_mlp_pool == flax SharedMLP + max-pool, values AND grads AND
    batch_stats updates — the claim that anchors the fused path's gradient
    semantics to the parity-tested module."""
    B, S, K, C0 = 2, 12, 16, 4
    key = jax.random.PRNGKey(2)
    g = jax.random.normal(key, (B, S, K, C0))

    mod = SharedMLP(list(CHANS))
    variables = mod.init(jax.random.PRNGKey(3), g, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def flax_fwd(params, stats, train):
        out, upd = mod.apply({"params": params, "batch_stats": stats}, g,
                             train=train, mutable=["batch_stats"])
        return jnp.max(out, axis=2), upd["batch_stats"]

    def plain_fwd(params, stats, train):
        ks = [params[f"layer{i}"]["kernel"] for i in range(len(CHANS))]
        ss = [params[f"bn{i}"]["scale"] for i in range(len(CHANS))]
        bs = [params[f"bn{i}"]["bias"] for i in range(len(CHANS))]
        rm = [stats[f"bn{i}"]["mean"] for i in range(len(CHANS))]
        rv = [stats[f"bn{i}"]["var"] for i in range(len(CHANS))]
        pooled, means, variances = fused_mlp.plain_mlp_pool(
            g, ks, ss, bs, rm, rv, train, BN_EPS, jnp.float32)
        upd = {f"bn{i}": {
            "mean": BN_MOMENTUM * rm[i] + (1 - BN_MOMENTUM) * means[i],
            "var": BN_MOMENTUM * rv[i] + (1 - BN_MOMENTUM) * variances[i]}
            for i in range(len(CHANS))} if train else stats
        return pooled, upd

    for train in (True, False):
        pa, ua = flax_fwd(params, stats, train)
        pb, ub = plain_fwd(params, stats, train)
        assert np.array_equal(np.asarray(pa), np.asarray(pb))
        for la, lb in zip(jax.tree_util.tree_leaves(ua),
                          jax.tree_util.tree_leaves(ub)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7)

    # gradients: flax BatchNorm arranges the affine as y = x*mul + (b - mu*
    # mul), the plain chain as (x - mu)*mul + b — same real function (the
    # forward is BITWISE equal above), differently associated backward, so
    # grads agree to reassociation ulp rather than bitwise
    ga = jax.grad(lambda p: jnp.sum(flax_fwd(p, stats, True)[0]))(params)
    gb = jax.grad(lambda p: jnp.sum(plain_fwd(p, stats, True)[0]))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-5)


def test_module_drop_in():
    """FusedMLPPool consumes/produces SharedMLP's exact variable tree and
    matches its output + running-stat updates to kernel tolerance."""
    B, S, K, C0 = 2, 16, 16, 4
    key = jax.random.PRNGKey(4)
    g = jax.random.normal(key, (B, S, K, C0))

    ref = SharedMLP(list(CHANS))
    fus = FusedMLPPool(list(CHANS))
    v_ref = ref.init(jax.random.PRNGKey(5), g, train=True)
    v_fus = fus.init(jax.random.PRNGKey(5), g, train=True)
    # identical tree structure (params and batch_stats) in both directions
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fus))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree_util.tree_leaves(v_ref),
                   jax.tree_util.tree_leaves(v_fus)))

    # run the fused module on the UNFUSED init (param exchange direction)
    for train in (True, False):
        out_r, upd_r = ref.apply(v_ref, g, train=train,
                                 mutable=["batch_stats"])
        out_r = jnp.max(out_r, axis=2)
        out_f, upd_f = fus.apply(v_ref, g, train=train,
                                 mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=5e-5)
        for la, lb in zip(jax.tree_util.tree_leaves(upd_f),
                          jax.tree_util.tree_leaves(upd_r)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-5)


def test_sa_module_fused_wiring():
    """SAModuleVotes(fused=True) on a tileable shape routes through the
    kernel (same variable tree, matching outputs vs fused=False); on a
    non-tileable shape it silently falls back to SharedMLP bitwise."""
    from omni_pq_tpu.models.pointnet2 import SAModuleVotes

    key = jax.random.PRNGKey(7)
    B, N = 2, 64
    xyz = jax.random.uniform(key, (B, N, 3)) * 2.0 + 0.3
    feats = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 5))

    kw = dict(npoint=16, radius=0.5, nsample=16, mlp_channels=[128, 128],
              normalize_xyz=True)
    ref = SAModuleVotes(fused=False, **kw)
    fus = SAModuleVotes(fused=True, **kw)
    v = ref.init(jax.random.PRNGKey(8), xyz, feats, train=True)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        fus.init(jax.random.PRNGKey(8), xyz, feats, train=True)))
    for train in (True, False):
        (x_r, f_r, i_r), upd_r = ref.apply(v, xyz, feats, train=train,
                                           mutable=["batch_stats"])
        (x_f, f_f, i_f), upd_f = fus.apply(v, xyz, feats, train=train,
                                           mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_r))
        np.testing.assert_array_equal(np.asarray(x_f), np.asarray(x_r))
        np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_r),
                                   atol=5e-5)
        for la, lb in zip(jax.tree_util.tree_leaves(upd_f),
                          jax.tree_util.tree_leaves(upd_r)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-4, atol=1e-5)

    # non-tileable channels (e.g. vote_aggregation's 288): fused=True is a
    # bitwise no-op
    kw288 = dict(kw, mlp_channels=[96, 96])
    ref288 = SAModuleVotes(fused=False, **kw288)
    fus288 = SAModuleVotes(fused=True, **kw288)
    v288 = ref288.init(jax.random.PRNGKey(9), xyz, feats, train=True)
    (x_r, f_r, _), _ = ref288.apply(v288, xyz, feats, train=True,
                                    mutable=["batch_stats"])
    (x_f, f_f, _), _ = fus288.apply(v288, xyz, feats, train=True,
                                    mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_r))


def test_supports_gate():
    assert fused_mlp.supports(16, (128, 256), jnp.float32)
    assert fused_mlp.supports(64, (128, 128, 256), jnp.bfloat16)
    assert not fused_mlp.supports(16, (288, 288), jnp.float32)  # vote_agg
    assert not fused_mlp.supports(12, (128,), jnp.float32)      # K % 8
    assert not fused_mlp.supports(8, (128,), jnp.bfloat16)      # K % 16
    assert not fused_mlp.supports(16, (128,), jnp.float64)      # f64 runs
