"""Kernel-tier tests: Pallas kernels vs pure-jnp/numpy oracles.

The numpy oracles here re-state the reference CUDA semantics independently
(SURVEY.md §2.1); the jnp references in ops/reference.py are tested against
them, and the Pallas kernels against the jnp references (interpret mode on
CPU, compiled on TPU).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni_pq_tpu import ops


def np_fps(xyz, npoint):
    """Numpy oracle: seed idx 0, skip ||p||^2<=1e-3, maximize running min-dist."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        valid = (xyz[b] ** 2).sum(-1) > 1e-3
        mind = np.full(N, 1e10)
        last = 0
        for i in range(1, npoint):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            score = np.where(valid, mind, -1.0)
            last = int(np.argmax(score))
            out[b, i] = last
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    out = np.zeros((B, S, nsample), dtype=np.int32)
    for b in range(B):
        for s in range(S):
            d2 = ((xyz[b] - new_xyz[b, s]) ** 2).sum(-1)
            hits = np.where(d2 < radius * radius)[0][:nsample]
            if len(hits) == 0:
                continue
            row = np.full(nsample, hits[0], dtype=np.int32)
            row[:len(hits)] = hits
            out[b, s] = row
    return out


class TestFPS:
    def test_ref_matches_numpy(self, rng):
        xyz = rng.normal(size=(2, 100, 3)).astype(np.float32) + 2.0
        np.testing.assert_array_equal(np.asarray(ops.fps_ref(jnp.asarray(xyz), 16)),
                                      np_fps(xyz, 16))

    def test_skips_origin_padding(self, rng):
        xyz = rng.normal(size=(1, 64, 3)).astype(np.float32) + 2.0
        xyz[:, 40:] = 0.0  # padding at origin
        idx = np.asarray(ops.fps_ref(jnp.asarray(xyz), 20))
        assert idx.max() < 40

    def test_pallas_matches_ref(self, rng):
        xyz = rng.normal(size=(3, 533, 3)).astype(np.float32) + 2.0
        got = np.asarray(ops.fps(jnp.asarray(xyz), 64))
        want = np.asarray(ops.fps_ref(jnp.asarray(xyz), 64))
        np.testing.assert_array_equal(got, want)

    def test_pallas_large_batch_chunking(self, rng):
        xyz = rng.normal(size=(11, 300, 3)).astype(np.float32) + 2.0
        got = np.asarray(ops.fps(jnp.asarray(xyz), 32))
        want = np.asarray(ops.fps_ref(jnp.asarray(xyz), 32))
        np.testing.assert_array_equal(got, want)

    def test_pallas_bitwise_through_near_ties(self):
        """Regression: uniform(0.5, 5) at (2, 5000) hits a min-dist near-tie
        at selection step 393 (values 3.6e-7 apart in relative terms). The
        kernel's old |p|^2 - 2p.c + |c|^2 rearrangement rounded it the other
        way from the oracle's direct |p - c|^2 IN INTERPRET MODE — the
        bitwise gate must hold through ties, so the kernel now uses the
        direct form."""
        r = np.random.default_rng(0)
        xyz = jnp.asarray(r.uniform(0.5, 5, (2, 5000, 3)).astype(np.float32))
        got = np.asarray(ops.fps(xyz, 512))
        want = np.asarray(ops.fps_ref(xyz, 512))
        np.testing.assert_array_equal(got, want)

    def test_spread(self, rng):
        # selected points should be well-spread: min pairwise distance of the
        # FPS subset must exceed that of a random subset
        xyz = rng.uniform(size=(1, 512, 3)).astype(np.float32) + 1.0
        idx = np.asarray(ops.fps(jnp.asarray(xyz), 32))[0]
        sel = xyz[0, idx]
        d = ((sel[:, None] - sel[None]) ** 2).sum(-1)
        np.fill_diagonal(d, 1e9)
        rand = xyz[0, rng.choice(512, 32, replace=False)]
        dr = ((rand[:, None] - rand[None]) ** 2).sum(-1)
        np.fill_diagonal(dr, 1e9)
        assert d.min() > dr.min()


class TestBallQuery:
    def test_ref_matches_numpy(self, rng):
        xyz = rng.uniform(size=(2, 200, 3)).astype(np.float32)
        ctr = xyz[:, :30]
        got = np.asarray(ops.ball_query_ref(0.2, 8, jnp.asarray(xyz), jnp.asarray(ctr)))
        np.testing.assert_array_equal(got, np_ball_query(0.2, 8, xyz, ctr))

    def test_pallas_matches_ref(self, rng):
        # large enough to take the Pallas path (N*S > 256k)
        xyz = rng.uniform(size=(2, 2000, 3)).astype(np.float32) * 3
        ctr = xyz[:, :200]
        got = np.asarray(ops.ball_query(0.4, 16, jnp.asarray(xyz), jnp.asarray(ctr)))
        want = np.asarray(ops.ball_query_ref(0.4, 16, jnp.asarray(xyz), jnp.asarray(ctr)))
        np.testing.assert_array_equal(got, want)

    def test_pallas_matches_ref_morton_ordered(self, rng):
        # the production data pipeline emits Morton-ordered clouds; the
        # chunk-bbox skip must stay bitwise-exact on them
        from omni_pq_tpu.data.spatial import spatial_sort
        xyz = rng.uniform(size=(2, 2000, 3)).astype(np.float32) * 3
        xyz = np.stack([xyz[b][spatial_sort(xyz[b])] for b in range(2)])
        ctr = xyz[:, ::10][:, :200]
        got = np.asarray(ops.ball_query(0.4, 16, jnp.asarray(xyz), jnp.asarray(ctr)))
        want = np.asarray(ops.ball_query_ref(0.4, 16, jnp.asarray(xyz), jnp.asarray(ctr)))
        np.testing.assert_array_equal(got, want)

    def test_boundary_disagreements_are_1ulp_only(self, rng):
        """Adversarial shells at radius*(1 +- 1e-6) expose that XLA's FMA
        contraction makes d^2 vs r^2 membership fusion/shape-dependent at
        the last ULP (kernel and oracle can each round a boundary point
        either way; the reference's own CUDA differs from torch-CPU the
        same way). Property: every kernel/oracle index disagreement lies
        within 3e-6 relative of the radius boundary — never an interior
        point."""
        B, N, S, r = 2, 2048, 128, 0.4
        ctr = rng.uniform(1, 4, (B, S, 3)).astype(np.float32)
        pts = []
        for b in range(B):
            base = ctr[b][rng.integers(0, S, N)]
            dirs = rng.normal(size=(N, 3))
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
            rad = r * (1 + rng.normal(scale=1e-6, size=(N, 1)))
            pts.append(base + dirs * rad)
        xyz = np.stack(pts).astype(np.float32)
        a = np.asarray(ops.ball_query(r, 64, jnp.asarray(xyz),
                                      jnp.asarray(ctr)))
        b = np.asarray(ops.ball_query_ref(r, 64, jnp.asarray(xyz),
                                          jnp.asarray(ctr)))
        for bi, si in np.argwhere((a != b).any(-1)):
            diff = set(a[bi, si].tolist()) ^ set(b[bi, si].tolist())
            for j in diff:
                d = np.linalg.norm(
                    xyz[bi, j].astype(np.float64)
                    - ctr[bi, si].astype(np.float64))
                assert abs(d - r) / r < 3e-6, (bi, si, j, d)

    def test_no_hits_gives_zero(self):
        xyz = jnp.ones((1, 100, 3)) * 5.0
        ctr = jnp.zeros((1, 10, 3))
        got = np.asarray(ops.ball_query_ref(0.1, 4, xyz, ctr))
        np.testing.assert_array_equal(got, np.zeros((1, 10, 4), np.int32))

    def test_fused_group_matches_composition(self, rng):
        # fused ball_query_group == ball_query + gather - center, on BOTH
        # code paths (small fallback and Pallas), centers drawn from points
        # (every real center has itself as a hit)
        for n, s in ((800, 64), (2000, 200)):
            xyz = rng.uniform(size=(2, n, 3)).astype(np.float32) * 3
            ctr = xyz[:, :: n // s][:, :s]
            idx, grouped = ops.ball_query_group(0.4, 16, jnp.asarray(xyz),
                                                jnp.asarray(ctr))
            want_idx = np.asarray(ops.ball_query(0.4, 16, jnp.asarray(xyz),
                                                 jnp.asarray(ctr)))
            np.testing.assert_array_equal(np.asarray(idx), want_idx)
            want = np.stack([xyz[b][want_idx[b]] for b in range(2)])
            want = want - ctr[:, :, None, :]
            np.testing.assert_allclose(np.asarray(grouped), want,
                                       rtol=1e-6, atol=1e-6)

    def test_fused_group_overflowing_balls(self, rng):
        # every ball has FAR more than nsample in-radius points: exercises
        # slot capping + the first-hit fill in both deposit paths
        n, s, k = 2000, 200, 8
        xyz = (rng.uniform(size=(1, n, 3)).astype(np.float32) * 0.3 + 1.0)
        ctr = xyz[:, :: n // s][:, :s]
        idx, grouped = ops.ball_query_group(5.0, k, jnp.asarray(xyz),
                                            jnp.asarray(ctr))
        want_idx = np.asarray(ops.ball_query_ref(5.0, k, jnp.asarray(xyz),
                                                 jnp.asarray(ctr)))
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        want = xyz[0][want_idx[0]] - ctr[0][:, None, :]
        np.testing.assert_allclose(np.asarray(grouped)[0], want,
                                   rtol=1e-6, atol=1e-6)

    def test_fused_group_off_cloud_centers(self, rng):
        # centers with ZERO in-radius hits (off-cloud) must reproduce the
        # reference CUDA padding semantics on the Pallas path too: idx row 0,
        # grouped row xyz[0] - center (zero-initialized idx buffer reads
        # point 0, ball_query_gpu.cu:38-45) == the unfused composition
        n, s, k = 2000, 256, 8  # n*s > small-path threshold -> Pallas
        xyz = rng.uniform(size=(2, n, 3)).astype(np.float32) * 3
        ctr = xyz[:, :: n // s][:, :s].copy()
        ctr[:, ::3] += 50.0  # every 3rd center far off-cloud
        idx, grouped = ops.ball_query_group(0.4, k, jnp.asarray(xyz),
                                            jnp.asarray(ctr))
        idx, grouped = np.asarray(idx), np.asarray(grouped)
        want_idx = np.asarray(ops.ball_query_ref(0.4, k, jnp.asarray(xyz),
                                                 jnp.asarray(ctr)))
        np.testing.assert_array_equal(idx, want_idx)
        want = np.stack([xyz[b][want_idx[b]] for b in range(2)])
        want = want - ctr[:, :, None, :]
        np.testing.assert_allclose(grouped, want, rtol=1e-6, atol=1e-6)
        # the off-cloud rows really took the no-hit path
        assert (idx[:, ::3] == 0).all()
        np.testing.assert_allclose(
            grouped[:, ::3],
            np.broadcast_to((xyz[:, :1] - ctr[:, ::3])[:, :, None, :],
                            grouped[:, ::3].shape), rtol=1e-6, atol=1e-6)

    def test_fused_group_off_cloud_vjp(self, rng):
        # gradient routing for no-hit rows: cotangent flows to xyz[0]/center
        # exactly like autodiff of the unfused composition
        xyz = jnp.asarray(rng.uniform(size=(1, 300, 3)).astype(np.float32))
        ctr_np = np.asarray(xyz)[:, ::10].copy()
        ctr_np[:, ::4] += 50.0
        ctr = jnp.asarray(ctr_np)

        def fused(x, c):
            _, g = ops.ball_query_group(0.4, 8, x, c)
            return jnp.sum(jnp.sin(g) * 2.0)

        def unfused(x, c):
            idx = ops.ball_query(0.4, 8, x, c)
            g = ops.group_points(x, idx) - c[:, :, None, :]
            return jnp.sum(jnp.sin(g) * 2.0)

        gf = jax.jit(jax.grad(fused, argnums=(0, 1)))(xyz, ctr)
        gu = jax.jit(jax.grad(unfused, argnums=(0, 1)))(xyz, ctr)
        for a, b in zip(gf, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_group_vjp(self, rng):
        # the custom VJP must equal autodiff of the unfused composition
        xyz = jnp.asarray(rng.uniform(size=(2, 300, 3)).astype(np.float32))
        ctr_inds = jnp.asarray(np.arange(0, 300, 10, dtype=np.int32)[None]
                               .repeat(2, 0))

        def fused(x):
            c = ops.gather_points(x, ctr_inds)
            _, g = ops.ball_query_group(0.4, 8, x, c)
            return jnp.sum(jnp.sin(g) * 2.0)

        def unfused(x):
            c = ops.gather_points(x, ctr_inds)
            idx = ops.ball_query(0.4, 8, x, c)
            g = ops.group_points(x, idx) - c[:, :, None, :]
            return jnp.sum(jnp.sin(g) * 2.0)

        gf = jax.jit(jax.grad(fused))(xyz)
        gu = jax.jit(jax.grad(unfused))(xyz)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                                   rtol=1e-5, atol=1e-6)

    def test_fused_group_feats_matches_composition(self, rng):
        # ball_query_group_feats == ball_query + group_points, BITWISE, on
        # both code paths (small fallback and Pallas), for f32 and bf16
        # features, 128-aligned and unaligned channel counts, and off-cloud
        # (zero-hit) centers — the one-hot MXU deposit is exact by
        # construction (value * 1 accumulated with zeros)
        for n, s, k, cf, dt in ((800, 64, 16, 7, jnp.float32),
                                (2000, 256, 16, 128, jnp.float32),
                                (2048, 256, 32, 130, jnp.float32),
                                (2000, 256, 8, 64, jnp.bfloat16)):
            xyz = rng.uniform(size=(2, n, 3)).astype(np.float32) * 3
            ctr = xyz[:, :: n // s][:, :s].copy()
            ctr[:, ::5] += 50.0  # every 5th center off-cloud
            feats = jnp.asarray(
                rng.standard_normal((2, n, cf)).astype(np.float32)).astype(dt)
            idx, grouped, gfeat = ops.ball_query_group_feats(
                0.4, k, jnp.asarray(xyz), jnp.asarray(ctr), feats)
            want_idx = np.asarray(ops.ball_query(0.4, k, jnp.asarray(xyz),
                                                 jnp.asarray(ctr)))
            np.testing.assert_array_equal(np.asarray(idx), want_idx)
            np.testing.assert_array_equal(
                np.asarray(gfeat),
                np.asarray(ops.group_points(feats, jnp.asarray(want_idx))))
            want = np.stack([xyz[b][want_idx[b]] for b in range(2)])
            want = want - ctr[:, :, None, :]
            np.testing.assert_allclose(np.asarray(grouped), want,
                                       rtol=1e-6, atol=1e-6)

    def test_fused_group_feats_vjp(self, rng):
        # custom VJP == autodiff of the unfused composition for all three
        # inputs, including off-cloud rows (feature cotangent -> features[0])
        for n, s in ((300, 30), (2000, 256)):  # small + Pallas paths
            xyz = jnp.asarray(rng.uniform(size=(1, n, 3)).astype(np.float32)
                              * 3)
            ctr_np = np.asarray(xyz)[:, :: n // s][:, :s].copy()
            ctr_np[:, ::4] += 50.0
            ctr = jnp.asarray(ctr_np)
            feats = jnp.asarray(
                rng.standard_normal((1, n, 32)).astype(np.float32))

            def fused(x, c, ft):
                _, g, gf = ops.ball_query_group_feats(0.4, 8, x, c, ft)
                return jnp.sum(jnp.sin(g) * 2.0) + jnp.sum(jnp.cos(gf) * 0.5)

            def unfused(x, c, ft):
                idx = ops.ball_query(0.4, 8, x, c)
                g = ops.group_points(x, idx) - c[:, :, None, :]
                gf = ops.group_points(ft, idx)
                return jnp.sum(jnp.sin(g) * 2.0) + jnp.sum(jnp.cos(gf) * 0.5)

            ga = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(xyz, ctr, feats)
            gb = jax.jit(jax.grad(unfused, argnums=(0, 1, 2)))(xyz, ctr,
                                                               feats)
            for a, b in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)


class TestInterpolate:
    def test_three_nn(self, rng):
        unk = rng.normal(size=(2, 50, 3)).astype(np.float32)
        kno = rng.normal(size=(2, 20, 3)).astype(np.float32)
        d2, idx = ops.three_nn(jnp.asarray(unk), jnp.asarray(kno))
        d2, idx = np.asarray(d2), np.asarray(idx)
        full = ((unk[:, :, None] - kno[:, None]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=-1)[..., :3]
        np.testing.assert_array_equal(np.sort(idx, -1), np.sort(want_idx, -1))
        np.testing.assert_allclose(d2, np.sort(full, -1)[..., :3], rtol=1e-5)

    def test_interpolate_weights_sum(self, rng):
        unk = rng.normal(size=(1, 30, 3)).astype(np.float32)
        kno = rng.normal(size=(1, 10, 3)).astype(np.float32)
        feats = np.ones((1, 10, 4), np.float32)
        out = ops.interpolate_features(jnp.asarray(unk), jnp.asarray(kno),
                                       jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)

    def test_gather_backward_is_scatter_add(self, rng):
        # the autodiff backward must be the exact segment sum over duplicated
        # indices (the ball-query fill-with-first-hit pattern), matching a
        # numpy np.add.at oracle
        B, N, C, S = 2, 40, 5, 64
        pts = rng.normal(size=(B, N, C)).astype(np.float32)
        idx = rng.integers(0, N, (B, S)).astype(np.int32)
        idx[:, :20] = 0  # heavy duplication

        def f(p):
            return jnp.sum(ops.gather_points(p, jnp.asarray(idx)) * 2.0)

        g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(pts)))
        want = np.zeros_like(pts)
        for b in range(B):
            np.add.at(want[b], idx[b], 2.0 * np.ones((S, C), np.float32))
        np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)

    def test_interpolate_grad(self, rng):
        # deterministic scatter-add gradient (vs the reference's atomicAdd)
        kno = jnp.asarray(rng.normal(size=(1, 10, 3)).astype(np.float32))
        unk = jnp.asarray(rng.normal(size=(1, 30, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(1, 10, 4)).astype(np.float32))
        f = lambda x: jnp.sum(ops.interpolate_features(unk, kno, x) ** 2)
        g = jax.grad(f)(feats)
        eps = 1e-3
        fd = (f(feats.at[0, 3, 2].add(eps)) - f(feats.at[0, 3, 2].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, 3, 2], np.asarray(fd), rtol=1e-2)


class TestNNDistance:
    def test_against_loops(self, rng):
        a = rng.normal(size=(1, 5, 3)).astype(np.float32)
        b = rng.normal(size=(1, 7, 3)).astype(np.float32)
        d1, i1, d2, i2 = ops.nn_distance(jnp.asarray(a), jnp.asarray(b))
        full = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d1), full.min(2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), full.min(1), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), full.argmin(2))
        np.testing.assert_array_equal(np.asarray(i2), full.argmin(1))

    def test_l1(self, rng):
        a = rng.normal(size=(1, 4, 3)).astype(np.float32)
        b = rng.normal(size=(1, 6, 3)).astype(np.float32)
        d1, _, _, _ = ops.nn_distance(jnp.asarray(a), jnp.asarray(b), l1=True)
        full = np.abs(a[:, :, None] - b[:, None]).sum(-1)
        np.testing.assert_allclose(np.asarray(d1), full.min(2), rtol=1e-5)
