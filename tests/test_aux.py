"""Auxiliary-surface tests: legacy teacher loss, focal loss, MSG modules,
DoubleLoader, viz dumps, metrics logger, preprocessing pipeline."""
import json
import pytest
import os
import struct

import numpy as np
import jax
import jax.numpy as jnp

from omni_pq_tpu import losses
from omni_pq_tpu.config import SCANNET_MEAN_SIZES
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.models.pointnet2 import (SAModuleMSG, GroupAllModule,
                                          LFPModuleMSG)
from omni_pq_tpu.models.transformer import PointsObjClsModule, general_sampling
from omni_pq_tpu.data.loader import DoubleLoader, Loader
from tests.util import TINY, tiny_cloud


class TestTeacherLoss:
    @pytest.mark.slow
    def test_runs_and_finite(self, rng):
        model = PQTransformer(TINY)
        pc = jnp.asarray(tiny_cloud(rng))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), pc)
        ep = dict(jax.jit(lambda v, x: model.apply(v, x))(v, pc))
        B = 2
        ep["flip_x_axis"] = jnp.zeros((B,))
        ep["flip_y_axis"] = jnp.zeros((B,))
        ep["rot_mat"] = jnp.tile(jnp.eye(3), (B, 1, 1))
        loss = losses.get_loss_teacher(ep, ep, num_layer=TINY.num_decoder_layers)
        assert np.isfinite(float(loss))

    @pytest.mark.slow
    def test_identity_teacher_score_dominates(self, rng):
        # with student == teacher and identity augmentation, the geometric
        # losses (center/size/normal vs own predictions) should be ~0
        model = PQTransformer(TINY)
        pc = jnp.asarray(tiny_cloud(rng))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), pc)
        ep = dict(jax.jit(lambda v, x: model.apply(v, x))(v, pc))
        ep["flip_x_axis"] = jnp.zeros((2,))
        ep["flip_y_axis"] = jnp.zeros((2,))
        ep["rot_mat"] = jnp.tile(jnp.eye(3), (2, 1, 1))
        loss = losses.get_loss_teacher(ep, ep, num_layer=TINY.num_decoder_layers)
        assert float(loss) >= 0


class TestFocal:
    def test_matches_manual(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        target = jnp.asarray(np.eye(3)[rng.integers(0, 3, 4)].astype(np.float32))
        w = jnp.ones((4, 1))
        out = np.asarray(losses.sigmoid_focal_loss(logits, target, w))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        t = np.asarray(target)
        ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
        pt = t * p + (1 - t) * (1 - p)
        want = ((1 - pt) ** 2) * (t * 0.25 + (1 - t) * 0.75) * ce
        np.testing.assert_allclose(out, want, rtol=1e-4)


class TestExtraModules:
    def test_msg_module(self, rng):
        xyz = jnp.asarray(tiny_cloud(rng, batch=1, n=128))
        feats = jnp.asarray(rng.normal(size=(1, 128, 16)).astype(np.float32))
        m = SAModuleMSG(npoint=32, radii=(0.2, 0.4), nsamples=(8, 8),
                        mlps=((16, 24), (16, 24)))
        v = m.init(jax.random.PRNGKey(0), xyz, feats)
        nx, nf, inds = m.apply(v, xyz, feats)
        assert nx.shape == (1, 32, 3)
        assert nf.shape == (1, 32, 48)  # 24 + 24 concatenated

    def test_lfp_module_msg(self, rng):
        """LFPModuleMSG (pointnet2_modules.py:418-497): propagate features1
        at xyz1 onto the (distinct) xyz2 set; post-MLP weights are shared
        across scales; channel layout len(mlps)*post[-1]."""
        import jax as _jax
        xyz1 = jnp.asarray(tiny_cloud(rng, batch=2, n=128))
        xyz2 = jnp.asarray(tiny_cloud(rng, batch=2, n=32))
        f1 = jnp.asarray(rng.normal(size=(2, 128, 16)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))
        m = LFPModuleMSG(radii=(0.3, 0.6), nsamples=(8, 8),
                         mlps=((16, 24), (16, 24)), post_mlp=(32, 20))
        v = m.init(_jax.random.PRNGKey(0), xyz2, xyz1, f2, f1)
        # one shared post_mlp + one mlp per scale
        names = set(v["params"].keys())
        assert names == {"post_mlp", "mlp0", "mlp1"}, names
        out = m.apply(v, xyz2, xyz1, f2, f1,
                      mutable=False)
        assert out.shape == (2, 32, 40)  # 2 scales x post[-1]=20
        assert np.isfinite(np.asarray(out)).all()
        # skip-less variant matches the reference's features2=None branch
        v0 = m.init(_jax.random.PRNGKey(0), xyz2, xyz1, None, f1)
        out0 = m.apply(v0, xyz2, xyz1, None, f1)
        assert out0.shape == (2, 32, 40)

    def test_group_all(self, rng):
        xyz = jnp.asarray(tiny_cloud(rng, batch=1, n=64))
        m = GroupAllModule(mlp_channels=(8, 16))
        v = m.init(jax.random.PRNGKey(0), xyz)
        out = m.apply(v, xyz)
        assert out.shape == (1, 1, 16)

    def test_points_obj_cls(self, rng):
        feats = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
        m = PointsObjClsModule(32)
        v = m.init(jax.random.PRNGKey(0), feats)
        assert m.apply(v, feats).shape == (2, 64, 1)

    def test_general_sampling(self, rng):
        xyz = jnp.asarray(tiny_cloud(rng, batch=1, n=64))
        feats = jnp.asarray(rng.normal(size=(1, 64, 8)).astype(np.float32))
        inds = jnp.asarray([[3, 1, 7]])
        nx, nf, _ = general_sampling(xyz, feats, inds)
        np.testing.assert_allclose(np.asarray(nx)[0, 0], np.asarray(xyz)[0, 3])


class FakeDS:
    def __init__(self, n, tag):
        self.n, self.tag = n, tag

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"v": np.array([self.tag, i])}


class TestDoubleLoader:
    def test_alternates(self):
        a = Loader(FakeDS(4, 0), 1, shuffle=False)
        b = Loader(FakeDS(2, 1), 1, shuffle=False)
        dl = DoubleLoader(a, b)
        tags = [int(batch["v"][0, 0]) for batch in dl]
        assert tags == [0, 1, 0, 1, 0, 1, 0, 1]


class TestViz:
    def test_ply_dumps(self, tmp_path, rng):
        from omni_pq_tpu.utils.viz import (write_ply_points, write_ply_boxes,
                                           dump_quad_results, heat_colors)
        pts = rng.normal(size=(10, 3))
        write_ply_points(pts, str(tmp_path / "pc.ply"),
                         heat_colors(pts[:, 2]))
        assert (tmp_path / "pc.ply").read_text().startswith("ply")
        from omni_pq_tpu.evals import get_3d_box
        write_ply_boxes([get_3d_box((1, 1, 1), 0.3, (0, 0, 0))],
                        str(tmp_path / "box.ply"))
        txt = (tmp_path / "box.ply").read_text()
        assert "element vertex 8" in txt and "element face 12" in txt
        ep = {"last_quad_center": np.zeros((1, 2, 3)),
              "last_quad_size": np.ones((1, 2, 2)),
              "last_normal_vector": np.tile([1.0, 0, 0], (1, 2, 1)),
              "last_quad_scores": np.tile([-9.0, 9.0], (1, 2, 1))}
        dump_quad_results(ep, str(tmp_path / "dump"))
        assert os.path.exists(tmp_path / "dump" / "000_pred_quads.ply")


class TestMetricsLogger:
    def test_jsonl(self, tmp_path):
        from omni_pq_tpu.utils.metrics import MetricsLogger
        ml = MetricsLogger(str(tmp_path), enable_tensorboard=False)
        ml.log(1, {"loss": 2.5}, prefix="train")
        ml.log(2, {"loss": 1.5})
        ml.close()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
        assert json.loads(lines[0])["train/loss"] == 2.5
        assert json.loads(lines[1])["loss"] == 1.5


def write_fake_raw_scannet(root, scan, rng, n=800):
    d = os.path.join(root, scan)
    os.makedirs(d, exist_ok=True)
    pts = rng.uniform(0, 4, (n, 3))
    # binary_little_endian ply with x y z r g b (float/uchar)
    with open(os.path.join(d, f"{scan}_vh_clean_2.ply"), "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        for p in pts:
            f.write(struct.pack("<fffBBB", *p, 100, 120, 140))
    segs = rng.integers(0, 20, n)
    with open(os.path.join(d, f"{scan}_vh_clean_2.0.010000.segs.json"), "w") as f:
        json.dump({"segIndices": segs.tolist()}, f)
    agg = {"segGroups": [
        {"objectId": 0, "label": "chair", "segments": [0, 1, 2]},
        {"objectId": 1, "label": "table", "segments": [3, 4]},
    ]}
    with open(os.path.join(d, f"{scan}.aggregation.json"), "w") as f:
        json.dump(agg, f)
    with open(os.path.join(d, f"{scan}.txt"), "w") as f:
        f.write("axisAlignment = " + " ".join(
            str(x) for x in np.eye(4).ravel()) + "\n")
    return pts


class TestPreprocess:
    def test_export_and_normals(self, tmp_path, rng):
        from omni_pq_tpu.data.preprocess import (export_scene, process_scan,
                                                 estimate_normals)
        scan = "scene0000_00"
        write_fake_raw_scannet(str(tmp_path / "scans"), scan, rng)
        label_map = {"chair": 5, "table": 7}
        mesh, sem, ins, bboxes = export_scene(
            str(tmp_path / "scans" / scan), scan, label_map)
        assert mesh.shape[1] == 6
        assert set(np.unique(ins)) <= {0, 1, 2}
        assert (sem[ins == 1] == 5).all()
        assert bboxes.shape == (2, 7)

        out = str(tmp_path / "out")
        nrm = str(tmp_path / "normals")
        process_scan(str(tmp_path / "scans"), scan, out, nrm, label_map,
                     np.random.default_rng(0), max_points=500)
        v = np.load(os.path.join(out, scan + "_vert.npy"))
        assert v.shape == (500, 6)
        normals = np.load(os.path.join(nrm, scan + ".normal.npy"))
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0,
                                   atol=1e-5)

    def test_normals_of_plane(self, rng):
        from omni_pq_tpu.data.preprocess import estimate_normals
        # points on z=0 plane -> normals +-z; flipped toward center above
        pts = np.concatenate([rng.uniform(0, 2, (300, 2)),
                              np.zeros((300, 1))], axis=1)
        n = estimate_normals(pts, k=20)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-5)


class TestCompileCache:
    def test_enable_strips_python_stack_locations(self, tmp_path):
        """enable() must turn jax_include_full_tracebacks_in_locations off
        (round-3 root cause: Python-stack MLIR locations inside Mosaic
        custom-call payloads fragment the persistent cache key per launch
        path — 73 distinct 74 MB entries for one train step) and point the
        persistent cache at the given dir."""
        import jax as _jax
        from omni_pq_tpu.utils import compile_cache
        prev_dir = _jax.config.jax_compilation_cache_dir
        prev_loc = _jax.config.jax_include_full_tracebacks_in_locations
        try:
            _jax.config.update("jax_include_full_tracebacks_in_locations",
                               True)
            compile_cache.enable(str(tmp_path / "cache"))
            assert _jax.config.jax_include_full_tracebacks_in_locations \
                is False
            # round-5: cache dir is partitioned by a host-ISA fingerprint so
            # a disk image moved across machine types never serves foreign
            # XLA:CPU AOT executables (SIGILL hazard)
            assert _jax.config.jax_compilation_cache_dir == str(
                tmp_path / "cache" / compile_cache._host_fingerprint())
        finally:
            _jax.config.update("jax_compilation_cache_dir", prev_dir)
            _jax.config.update("jax_include_full_tracebacks_in_locations",
                               prev_loc)

    def test_full_locations_opt_out(self, tmp_path, monkeypatch):
        import jax as _jax
        from omni_pq_tpu.utils import compile_cache
        prev_dir = _jax.config.jax_compilation_cache_dir
        prev_loc = _jax.config.jax_include_full_tracebacks_in_locations
        try:
            _jax.config.update("jax_include_full_tracebacks_in_locations",
                               True)
            monkeypatch.setenv("OMNI_PQ_FULL_LOCATIONS", "1")
            compile_cache.enable(str(tmp_path / "cache"))
            assert _jax.config.jax_include_full_tracebacks_in_locations \
                is True
        finally:
            _jax.config.update("jax_compilation_cache_dir", prev_dir)
            _jax.config.update("jax_include_full_tracebacks_in_locations",
                               prev_loc)


class TestNativeNormals:
    def test_native_matches_numpy_pca(self, rng, monkeypatch):
        """Native grid-hash k-NN PCA normals vs the exact numpy path on a
        two-plane scene: same (unit) normals up to eigenvector sign."""
        from omni_pq_tpu.data import preprocess
        from omni_pq_tpu import native as native_mod
        if native_mod.get_lib() is None:
            pytest.skip("native lib unavailable")
        n = 800
        wall = np.stack([np.full(n // 2, 2.0),
                         rng.uniform(-3, 3, n // 2),
                         rng.uniform(0, 2.5, n // 2)], axis=1)
        floor = np.stack([rng.uniform(-3, 3, n // 2),
                          rng.uniform(-3, 3, n // 2),
                          np.zeros(n // 2)], axis=1)
        pts = np.concatenate([wall, floor]) + rng.normal(
            scale=1e-3, size=(n, 3))
        got = preprocess.estimate_normals(pts, k=24)
        monkeypatch.setattr(preprocess, "estimate_normals_native",
                            lambda *a: None, raising=False)
        monkeypatch.setattr(native_mod, "estimate_normals_native",
                            lambda *a: None)
        want = preprocess.estimate_normals(pts, k=24)
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   atol=1e-5)
        agree = np.abs(np.sum(got * want, axis=1))
        assert (agree > 0.999).mean() > 0.99, agree.min()
        # orientation convention: away from the raised scene center
        center = pts.mean(0)
        center[2] = (pts[:, 2].max() + center[2]) / 2
        outward = np.einsum("ni,ni->n", pts - center, got)
        assert (outward >= -1e-6).all()


class TestVizDataScript:
    """scripts/viz_data.py — the reference's three standalone debug-viz
    scripts (scannet/data_viz.py, scannet/viz_transformed_ply.py,
    ARKitScenes/viz_clean_ply.py) as one CLI."""

    def _mod(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "viz_data", os.path.join(os.path.dirname(__file__), "..",
                                     "scripts", "viz_data.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_scannet_scene(self, tmp_path, rng):
        mod = self._mod()
        prefix = str(tmp_path / "scene0000_00")
        n = 200
        np.save(prefix + "_vert.npy",
                np.concatenate([rng.uniform(0, 4, (n, 3)),
                                rng.uniform(0, 255, (n, 3))], 1))
        np.save(prefix + "_ins_label.npy", rng.integers(0, 5, n))
        np.save(prefix + "_sem_label.npy", rng.integers(0, 18, n))
        np.save(prefix + "_bbox.npy",
                np.array([[1, 1, 1, 0.5, 0.6, 0.7, 3.0]]))
        out = str(tmp_path / "dump")
        mod.scannet_scene(prefix, out)
        for f in ("scene.ply", "scene_instance.ply", "scene_semantic.ply",
                  "gt_boxes.ply"):
            assert os.path.getsize(os.path.join(out, f)) > 0

    def test_scannet_transform(self, tmp_path, rng):
        mod = self._mod()
        scan = "scene0000_00"
        write_fake_raw_scannet(str(tmp_path), scan, rng, n=100)
        out = str(tmp_path / "dump")
        mod.scannet_transform(str(tmp_path / scan), out)
        assert os.path.getsize(
            os.path.join(out, f"{scan}_transformed.ply")) > 0

    def test_arkit_clean(self, tmp_path, rng):
        mod = self._mod()
        scan = "41125722"
        d = tmp_path / scan
        prep = d / f"{scan}_offline_prepared_data"
        prep.mkdir(parents=True)
        n = 500
        pts = rng.uniform(0, 4, (n, 3))
        with open(d / f"{scan}_3dod_mesh.ply", "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {n}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"property uchar red\nproperty uchar green\n"
                    b"property uchar blue\nend_header\n")
            for p in pts:
                f.write(struct.pack("<fffBBB", *p, 10, 20, 30))
        np.save(prep / f"{scan}_bbox.npy",
                {"bboxes": rng.uniform(0, np.pi, (4, 7))},
                allow_pickle=True)
        out = str(tmp_path / "dump")
        mod.arkit_clean(str(d), out)
        assert os.path.getsize(os.path.join(out, f"{scan}_clean.ply")) > 0
