"""Data-tier tests: plane extraction, ScanNet/ARKit loaders against fake
on-disk layouts, batching."""
import json
import os

import numpy as np
import pytest

from omni_pq_tpu.data import (ScannetDetectionDataset, ARKitSceneDataset,
                              Loader, collate, endless, get_normal, rectangle)
from omni_pq_tpu.data.quads import get_quads


def write_fake_scannet(root, scan_names, rng, n_verts=2000):
    os.makedirs(f"{root}/scannet_train_detection_data", exist_ok=True)
    os.makedirs(f"{root}/scannet_train_detection_data_normals", exist_ok=True)
    os.makedirs(f"{root}/scannet_planes", exist_ok=True)
    os.makedirs(f"{root}/meta_data", exist_ok=True)
    for scan in scan_names:
        verts = rng.uniform(0, 4, (n_verts, 6)).astype(np.float32)
        np.save(f"{root}/scannet_train_detection_data/{scan}_vert.npy", verts)
        ins = rng.integers(0, 5, n_verts)
        np.save(f"{root}/scannet_train_detection_data/{scan}_ins_label.npy", ins)
        sem = np.where(ins < 3, 4, 1)  # nyu40 id 4 (bed) for instances 0-2
        np.save(f"{root}/scannet_train_detection_data/{scan}_sem_label.npy", sem)
        bbox = np.zeros((3, 7))
        bbox[:, 0:3] = rng.uniform(1, 3, (3, 3))
        bbox[:, 3:6] = rng.uniform(0.5, 1.5, (3, 3))
        bbox[:, 6] = 4  # nyu40 id
        np.save(f"{root}/scannet_train_detection_data/{scan}_bbox.npy", bbox)
        nrm = rng.normal(size=(n_verts, 3)).astype(np.float32)
        np.save(f"{root}/scannet_train_detection_data_normals/{scan}.normal.npy", nrm)
        # a room of 2 vertical quads + 1 floor; json stores (x, z, -y)
        verts3 = [[0, 0, 2], [4, 0, 2], [4, 2.5, 2], [0, 2.5, 2],   # wall y=-2
                  [0, 0, -2], [0, 2.5, -2], [4, 2.5, -2], [4, 0, -2],  # wall y=2
                  [0, 0.25, 2], [4, 0.25, 2], [4, 0.25, -2], [0, 0.25, -2]]  # floor z=0.25
        quads = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
        with open(f"{root}/scannet_planes/{scan}.json", "w") as f:
            json.dump({"verts": verts3, "quads": quads}, f)
    with open(f"{root}/meta_data/scannetv2_train.txt", "w") as f:
        f.write("\n".join(scan_names[:-1]))
    with open(f"{root}/meta_data/scannetv2_val.txt", "w") as f:
        f.write(scan_names[-1])


class TestQuadExtraction:
    def test_get_normal_vertical(self):
        qv = np.array([[0, 1, 0], [2, 1, 0], [2, 1, 2], [0, 1, 2]], float)
        n = get_normal(qv)
        np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-8)

    def test_get_normal_horizontal(self):
        qv = np.array([[0, 0, 1], [2, 0, 1], [2, 2, 1], [0, 2, 1]], float)
        n = get_normal(qv)
        np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=1e-6)

    def test_rectangle_sizes(self):
        # wall in xz plane: width 4 (x), height 2.5 (z)
        qv = np.array([[0, 1, 0], [4, 1, 0], [4, 1, 2.5], [0, 1, 2.5]], float)
        r = rectangle(qv)
        np.testing.assert_allclose(r[0:3], [2, 1, 1.25], atol=1e-8)
        np.testing.assert_allclose(np.abs(r[3:6]), [0, 1, 0], atol=1e-8)
        np.testing.assert_allclose(sorted(r[6:8]), [2.5, 4.0], atol=1e-8)
        np.testing.assert_allclose(r[6], 4.0, atol=1e-8)  # w then h

    def test_get_quads_splits_vertical_horizontal(self, tmp_path, rng):
        write_fake_scannet(str(tmp_path), ["scene0000_00"], rng)
        rects, total, horiz = get_quads(
            str(tmp_path / "scannet_planes/scene0000_00.json"))
        assert total == 3
        assert rects.shape == (2, 8)      # two walls
        assert horiz.shape[0] == 1        # one floor


class TestScannetDataset:
    def test_load_and_shapes(self, tmp_path, rng):
        scans = ["scene0000_00", "scene0001_00", "scene0002_00"]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train", num_points=1024)
        assert len(ds) == 2
        s = ds[0]
        assert s["point_clouds"].shape == (1024, 3)
        assert s["ema_point_clouds"].shape == (1024, 3)
        assert s["vote_label"].shape == (1024, 9)
        assert s["gt_quad_centers"].shape == (32, 3)
        assert s["num_gt_quads"] == 2
        assert s["num_total_quads"] == 3
        assert s["num_gt_boxes"] == 3
        assert s["vote_label_mask"].sum() > 0
        assert bool(s["use_gt"])

    def test_proportion_split(self, tmp_path, rng):
        scans = [f"scene{i:04d}_00" for i in range(5)]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train",
                                     start_proportion=0.5, end_proportion=1.0,
                                     num_points=256)
        assert len(ds) == 2  # 4 train scans * [0.5, 1.0)
        assert not bool(ds[0]["use_gt"])

    def test_augment_consistency_records(self, tmp_path, rng):
        scans = ["scene0000_00", "scene0001_00"]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train", num_points=512,
                                     augment=True, seed=3)
        s = ds[0]
        assert s["rot_mat"].shape == (3, 3)
        # rot_mat is orthonormal
        np.testing.assert_allclose(s["rot_mat"] @ s["rot_mat"].T, np.eye(3),
                                   atol=1e-5)
        assert 0.84 <= float(s["scale"]) <= 1.16


class TestLoader:
    def test_batching(self, tmp_path, rng):
        scans = [f"scene{i:04d}_00" for i in range(5)]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train", num_points=256)
        ld = Loader(ds, batch_size=2)
        batches = list(ld)
        assert len(batches) == 2
        assert batches[0]["point_clouds"].shape == (2, 256, 3)

    def test_endless(self, tmp_path, rng):
        scans = [f"scene{i:04d}_00" for i in range(3)]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train", num_points=256)
        it = endless(Loader(ds, batch_size=2, drop_last=False))
        for _ in range(4):
            b = next(it)
            assert b["point_clouds"].shape[1] == 256

    def test_sharding(self, tmp_path, rng):
        scans = [f"scene{i:04d}_00" for i in range(5)]
        write_fake_scannet(str(tmp_path), scans, rng)
        ds = ScannetDetectionDataset(str(tmp_path), "train", num_points=256)
        l0 = Loader(ds, batch_size=1, shuffle=False, shard_id=0, num_shards=2)
        l1 = Loader(ds, batch_size=1, shuffle=False, shard_id=1, num_shards=2)
        i0 = [int(b["scan_idx"][0]) for b in l0]
        i1 = [int(b["scan_idx"][0]) for b in l1]
        assert len(i0) == len(i1) == 2
        assert set(i0).isdisjoint(i1)


def write_fake_arkit(root, scans, rng, n_verts=3000, valid_scans=()):
    os.makedirs(f"{root}/dataset/3dod/Training", exist_ok=True)
    os.makedirs(f"{root}/data/annotations", exist_ok=True)
    with open(f"{root}/dataset/train_filtered.txt", "w") as f:
        f.write("\n".join(scans))

    def write_scan(d, scan):
        os.makedirs(d, exist_ok=True)
        np.save(f"{d}/{scan}_pc.npy",
                rng.uniform(-3, 3, (n_verts, 3)).astype(np.float32))
        np.save(f"{d}/{scan}_normal.npy",
                rng.normal(size=(n_verts, 3)).astype(np.float32))
        boxes = {"bboxes": rng.uniform(0.3, 2.0, (4, 7)),
                 "types": ["chair", "table", "bed", "sofa"]}
        np.save(f"{d}/{scan}_bbox.npy", boxes, allow_pickle=True)

    for scan in scans:
        write_scan(f"{root}/dataset/3dod/Training/{scan}/"
                   f"{scan}_offline_prepared_data", scan)
    if valid_scans:
        os.makedirs(f"{root}/dataset/3dod/Validation", exist_ok=True)
        with open(f"{root}/dataset/valid_filtered.txt", "w") as f:
            f.write("\n".join(valid_scans))
        with open(f"{root}/data/file.txt", "w") as f:
            f.write("\n".join(f"{s},anno_{s}" for s in valid_scans))
        for scan in valid_scans:
            write_scan(f"{root}/dataset/3dod/Validation/{scan}/"
                       f"{scan}_offline_prepared_data", scan)
            labels = []
            for _ in range(3):
                c = rng.uniform(-2, 2, 3)
                dim = sorted(rng.uniform(0.1, 3.0, 2))
                labels.append({"box3d": {
                    "location": {"x": c[0], "y": c[1], "z": c[2]},
                    "dimension": {"width": dim[1], "length": dim[0],
                                  "height": float(rng.uniform(1.5, 2.5))}}})
            with open(f"{root}/data/annotations/anno_{scan}.json", "w") as f:
                json.dump({"labels": labels}, f)


class TestARKit:
    def test_train_split(self, tmp_path, rng):
        write_fake_arkit(str(tmp_path), ["41048190", "41048191"], rng)
        ds = ARKitSceneDataset(str(tmp_path), "train", num_points=512)
        assert len(ds) == 2
        s = ds[0]
        assert s["point_clouds"].shape == (512, 3)
        assert s["center_label"].shape == (64, 3)
        assert s["num_gt_boxes"] == 4
        assert "gt_quad_centers" not in s  # weak split has no quad GT


class TestQuadGeometryReferenceParity:
    """get_normal / rectangle / planarity vs the reference's scannet_planes
    code imported verbatim (its dump_helper import chain is shimmed; the
    geometry functions are pure numpy/torch)."""

    @staticmethod
    def _ref_planes():
        import sys
        import types
        shim = types.ModuleType("numpy.lib.function_base")
        shim.vectorize = np.vectorize
        sys.modules.setdefault("numpy.lib.function_base", shim)
        ply = types.ModuleType("plyfile")
        ply.PlyData, ply.PlyElement = object, object
        sys.modules.setdefault("plyfile", ply)
        sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
        for p in ("/root/reference", "/root/reference/models",
                  "/root/reference/utils", "/root/reference/scannet"):
            sys.path.insert(0, p)
        try:
            import scannet_planes
            return scannet_planes
        except Exception:
            return None
        finally:
            for _ in range(4):
                sys.path.pop(0)

    def test_geometry_matches_reference(self, rng):
        ref = self._ref_planes()
        if ref is None:
            pytest.skip("reference scannet_planes not importable")
        from omni_pq_tpu.data.quads import (four_points_in_same_plane,
                                            get_normal, rectangle)
        center = np.zeros(3)
        for trial in range(30):
            if trial % 3 == 0:  # vertical wall (singular x,y,1 system)
                x0, y0, y1, z1 = rng.uniform(0.5, 4, 4)
                qv = np.array([[x0, y0, 0], [x0, y1, 0],
                               [x0, y1, z1], [x0, y0, z1]], np.float64)
            elif trial % 3 == 1:  # tilted plane
                qv = rng.uniform(-3, 3, (4, 3))
                qv[:, 2] = 0.3 * qv[:, 0] - 0.2 * qv[:, 1] + 1.0
            else:  # general (usually non-planar)
                qv = rng.uniform(-3, 3, (4, 3))
            qv += rng.normal(scale=1e-3, size=(4, 3))
            assert (four_points_in_same_plane(*qv, 100)
                    == ref.isFourPointsInSamePlane(*qv, 100))
            np.testing.assert_allclose(get_normal(qv),
                                       ref.get_normal(qv, center),
                                       atol=1e-8, err_msg=f"trial {trial}")
            np.testing.assert_allclose(rectangle(qv),
                                       ref.rectangle(qv, center),
                                       atol=1e-8, err_msg=f"trial {trial}")
