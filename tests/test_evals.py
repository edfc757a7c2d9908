"""Eval-tier tests: geometry/IoU/NMS/AP/F1 semantics, including direct
numerical parity against the reference's own numpy box_util where importable."""
import sys

import numpy as np
import pytest

from omni_pq_tpu import evals
from omni_pq_tpu.evals.quad import QUAD_THRES


def ref_box_util():
    sys.path.insert(0, "/root/reference/utils")
    try:
        import box_util  # noqa
        return box_util
    except Exception:
        return None
    finally:
        sys.path.pop(0)


class TestBoxOps:
    def test_get_3d_box_axis_aligned(self):
        c = evals.get_3d_box((2.0, 4.0, 6.0), 0.0, (10.0, 20.0, 30.0))
        assert c.shape == (8, 3)
        np.testing.assert_allclose(c.min(0), [9.0, 17.0, 28.0])
        np.testing.assert_allclose(c.max(0), [11.0, 23.0, 32.0])

    def test_parity_with_reference_box_util(self, rng):
        bu = ref_box_util()
        if bu is None:
            pytest.skip("reference box_util not importable")
        for _ in range(20):
            size = rng.uniform(0.5, 3.0, 3)
            ang = rng.uniform(0, 2 * np.pi)
            ctr = rng.uniform(-2, 2, 3)
            np.testing.assert_allclose(
                evals.get_3d_box(size, ang, ctr), bu.get_3d_box(size, ang, ctr),
                rtol=1e-10)
        for _ in range(30):
            c1 = bu.get_3d_box(rng.uniform(0.5, 2, 3), rng.uniform(0, 6.3),
                               rng.uniform(-1, 1, 3))
            c2 = bu.get_3d_box(rng.uniform(0.5, 2, 3), rng.uniform(0, 6.3),
                               rng.uniform(-1, 1, 3))
            got = evals.box3d_iou(c1, c2)
            want = bu.box3d_iou(c1, c2)
            np.testing.assert_allclose(got[0], want[0], atol=1e-9)
            np.testing.assert_allclose(got[1], want[1], atol=1e-9)

    def test_iou_identical(self):
        c = evals.get_3d_box((1, 1, 1), 0.4, (0, 0, 0))
        iou, iou2d = evals.box3d_iou(c, c)
        np.testing.assert_allclose(iou, 1.0, atol=1e-6)

    def test_iou_disjoint(self):
        c1 = evals.get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        c2 = evals.get_3d_box((1, 1, 1), 0.0, (5, 0, 0))
        iou, _ = evals.box3d_iou(c1, c2)
        assert iou == 0.0

    def test_iou_half_overlap(self):
        c1 = evals.get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        c2 = evals.get_3d_box((1, 1, 1), 0.0, (0.5, 0, 0))
        iou, _ = evals.box3d_iou(c1, c2)
        np.testing.assert_allclose(iou, 0.5 / 1.5, atol=1e-6)


class TestNMS:
    def test_duplicates_suppressed(self):
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.9],
            [0.01, 0, 0, 1.01, 1, 1, 0.8],   # near-duplicate, lower score
            [5, 5, 5, 6, 6, 6, 0.7],
        ])
        pick = evals.nms_3d_faster(boxes, 0.25)
        assert sorted(pick) == [0, 2]

    def test_samecls_keeps_other_class(self):
        boxes = np.array([
            [0, 0, 0, 1, 1, 1, 0.9, 1],
            [0.01, 0, 0, 1.01, 1, 1, 0.8, 2],  # overlaps but class differs
        ])
        pick = evals.nms_3d_faster_samecls(boxes, 0.25)
        assert sorted(pick) == [0, 1]


class TestAP:
    def test_perfect_predictions(self):
        box = evals.get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        pred = {0: [(1, box, 0.9)]}
        gt = {0: [(1, box)]}
        _, _, ap = evals.eval_det(pred, gt, ovthresh=0.25)
        np.testing.assert_allclose(ap[1], 1.0)

    def test_calculator(self):
        box = evals.get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
        far = evals.get_3d_box((1, 1, 1), 0.0, (9, 9, 9))
        calc = evals.APCalculator(0.25)
        calc.step([[(0, box, 0.9), (0, far, 0.8)]], [[(0, box)]])
        m = calc.compute_metrics()
        np.testing.assert_allclose(m["mAP"], 1.0)  # fp ranked after tp
        np.testing.assert_allclose(m["AR"], 1.0)


def make_wall(cx, cy, nx, ny, width=2.0, height=2.5, cz=1.25):
    return {"center": np.array([cx, cy, cz]),
            "normal": np.array([nx, ny, 0.0]),
            "size": np.array([width, height])}


class TestQuadF1:
    def _ep_from_walls(self, walls, num_total=None, logits_hi=8.0):
        K = len(walls)
        ep = {
            "last_quad_center": np.array([w["center"] for w in walls])[None],
            "last_quad_size": np.array([w["size"] for w in walls])[None],
            "last_normal_vector": np.array([w["normal"] for w in walls])[None],
            "last_quad_scores": np.tile(np.array([-logits_hi, logits_hi]),
                                        (1, K, 1)),
        }
        gt = {
            "gt_quad_centers": np.zeros((1, 32, 3)),
            "gt_quad_sizes": np.zeros((1, 32, 2)),
            "gt_normal_vectors": np.zeros((1, 32, 3)),
            "num_gt_quads": np.array([K]),
            "num_total_quads": np.array([num_total if num_total else K]),
        }
        gt["gt_quad_centers"][0, :K] = ep["last_quad_center"][0]
        gt["gt_quad_sizes"][0, :K] = ep["last_quad_size"][0]
        gt["gt_normal_vectors"][0, :K] = ep["last_normal_vector"][0]
        return ep, gt

    def test_perfect_prediction_f1_1(self):
        walls = [make_wall(0, -1, 0, 1), make_wall(0, 1, 0, -1),
                 make_wall(-1, 0, 1, 0), make_wall(1, 0, -1, 0)]
        ep, gt = self._ep_from_walls(walls)
        cfg = {"nms_iou_quad": 0.25, "conf_thresh": 0.0}
        pred_cls, mask, pred_corners = evals.parse_quad_predictions(ep, cfg, "last_")
        gt_cls, gt_corners = evals.parse_quad_groundtruths(gt, cfg)
        calc = evals.QuadAPCalculator(0.25)
        calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
                  [np.zeros((4, 4, 3))])
        f1 = calc.compute_F1()
        np.testing.assert_allclose(f1, 1.0, atol=1e-6)

    def test_padded_total_quads_lower_recall(self):
        walls = [make_wall(0, -1, 0, 1)]
        ep, gt = self._ep_from_walls(walls, num_total=2)
        cfg = {"nms_iou_quad": 0.25, "conf_thresh": 0.0}
        pred_cls, _, pred_corners = evals.parse_quad_predictions(ep, cfg, "last_")
        gt_cls, gt_corners = evals.parse_quad_groundtruths(gt, cfg)
        calc = evals.QuadAPCalculator(0.25)
        calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
                  [np.zeros((4, 4, 3))])
        f1 = calc.compute_F1()
        # 1 tp, npos=2 (one padded gt) -> p=1, r=0.5, f1=2/3
        np.testing.assert_allclose(f1, 2 / 3, atol=1e-6)

    def test_small_perturbation_still_tp(self, rng):
        walls = [make_wall(0, -1, 0, 1), make_wall(-1, 0, 1, 0)]
        ep, gt = self._ep_from_walls(walls)
        ep["last_quad_center"] = ep["last_quad_center"] + 0.1
        cfg = {"nms_iou_quad": 0.25, "conf_thresh": 0.0}
        pred_cls, _, pred_corners = evals.parse_quad_predictions(ep, cfg, "last_")
        gt_cls, gt_corners = evals.parse_quad_groundtruths(gt, cfg)
        calc = evals.QuadAPCalculator(0.25)
        calc.step(pred_cls, gt_cls, pred_corners, gt_corners, [np.zeros((4, 4, 3))])
        np.testing.assert_allclose(calc.compute_F1(), 1.0, atol=1e-6)

    def test_low_confidence_filtered(self):
        walls = [make_wall(0, -1, 0, 1)]
        ep, gt = self._ep_from_walls(walls, logits_hi=0.0)  # prob 0.5 == thresh
        cfg = {"nms_iou_quad": 0.25, "conf_thresh": 0.0}
        _, _, pred_corners = evals.parse_quad_predictions(ep, cfg, "last_")
        assert len(pred_corners[0]) == 0  # prob must EXCEED 0.5

    def test_ceiling_floor_synthesis(self):
        # Reference quirk (ap_helper_pq.py:673-693): BOTH branches append, so
        # ceilings/floors always have 2*num_quads entries — the ceiling/floor
        # F1 credit (len==4 check, :716-721) can only fire for scenes with
        # exactly 2 predicted quads. Reproduced faithfully.
        walls4 = [make_wall(0, -1, 0, 1), make_wall(0, 1, 0, -1),
                  make_wall(-1, 0, 1, 0), make_wall(1, 0, -1, 0)]
        ep, gt = self._ep_from_walls(walls4)
        cfg = {"nms_iou_quad": 0.25, "conf_thresh": 0.0}
        _, _, pred_corners = evals.parse_quad_predictions(ep, cfg, "last_")
        calc = evals.QuadAPCalculator(0.25)
        ceilings, floors = calc.get_ceiling_and_floor(pred_corners[0])
        assert len(ceilings) == 8 and len(floors) == 8  # 2 per wall, no dedup

        walls2 = walls4[:2]
        ep2, _ = self._ep_from_walls(walls2)
        _, _, pred_corners2 = evals.parse_quad_predictions(ep2, cfg, "last_")
        ceilings2, floors2 = calc.get_ceiling_and_floor(pred_corners2[0])
        assert len(ceilings2) == 4 and len(floors2) == 4
        assert all(abs(c[2] - 2.5) < 1e-6 for c in ceilings2)
        assert all(abs(f[2] - 0.0) < 1e-6 for f in floors2)

    def test_heading_from_normal(self):
        assert abs(evals.heading_from_normal(np.array([0.0, 1, 0]))) < 1e-6
        np.testing.assert_allclose(
            evals.heading_from_normal(np.array([0.0, -1, 0])), np.pi, atol=1e-6)
        np.testing.assert_allclose(
            evals.heading_from_normal(np.array([1.0, 0, 0])), 3 * np.pi / 2,
            atol=1e-6)


class TestObjectParse:
    def test_roundtrip(self, rng):
        from omni_pq_tpu.config import DatasetConfig, SCANNET_MEAN_SIZES
        dc = DatasetConfig()
        B, K = 1, 4
        centers = rng.uniform(1, 3, (B, K, 3)).astype(np.float32)
        cls = rng.integers(0, 18, (B, K))
        ep = {
            "last_center": centers,
            "last_heading_scores": np.zeros((B, K, 1)),
            "last_heading_residuals": np.zeros((B, K, 1)),
            "last_size_scores": 10 * np.eye(18)[cls],
            "last_size_residuals": np.zeros((B, K, 18, 3)),
            "last_sem_cls_scores": 10 * np.eye(18)[cls],
            "last_objectness_scores": np.tile(np.array([-5.0, 5.0]), (B, K, 1)),
        }
        labels = {
            "center_label": centers,
            "heading_class_label": np.zeros((B, K), np.int64),
            "heading_residual_label": np.zeros((B, K)),
            "size_class_label": cls,
            "size_residual_label": np.zeros((B, K, 3)),
            "box_label_mask": np.ones((B, K)),
            "sem_cls_label": cls,
        }
        cfg = {"dataset_config": dc, "remove_empty_box": False,
               "use_3d_nms": True, "cls_nms": True, "nms_iou": 0.25,
               "use_old_type_nms": False, "per_class_proposal": True,
               "conf_thresh": 0.0}
        pred, mask = evals.parse_predictions(ep, cfg, "last_")
        gt = evals.parse_groundtruths(labels, cfg)
        calc = evals.APCalculator(0.25)
        calc.step(pred, gt)
        m = calc.compute_metrics()
        np.testing.assert_allclose(m["mAP"], 1.0, atol=1e-6)


class TestMetricUtil:
    def test_precision_recall(self):
        from omni_pq_tpu.evals.metric_util import (
            calc_iou, multi_scene_precision_recall)
        assert calc_iou([0, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1]) == 1.0
        assert calc_iou([0, 0, 0, 1, 1, 1], [5, 0, 0, 1, 1, 1]) == 0.0
        labels = np.array([[[0, 0, 0, 1, 1, 1], [3, 0, 0, 1, 1, 1]]])
        pred = np.array([[[0, 0, 0, 1, 1, 1, 0.9],     # TP
                          [9, 9, 9, 1, 1, 1, 0.8],     # FP
                          [3, 0, 0, 1, 1, 1, 0.1]]])   # below conf
        TP, FP, FN, (p, r) = multi_scene_precision_recall(
            labels, pred, iou_thresh=0.5, conf_thresh=0.5)
        assert (TP, FP, FN) == (1, 1, 1)
        assert p == 0.5 and r == 0.5


def ref_ap_helper():
    """Import the reference's ap_helper_pq directly as a parity oracle,
    shimming the modules its 2021-era deps expect (numpy<2 layout, plyfile,
    trimesh — none affect the metric code paths)."""
    import types
    shim = types.ModuleType("numpy.lib.function_base")
    shim.vectorize = np.vectorize
    sys.modules.setdefault("numpy.lib.function_base", shim)
    ply = types.ModuleType("plyfile")
    ply.PlyData, ply.PlyElement = object, object
    sys.modules.setdefault("plyfile", ply)
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    for p in ("/root/reference", "/root/reference/models",
              "/root/reference/utils"):
        sys.path.insert(0, p)
    try:
        import ap_helper_pq
        return ap_helper_pq
    except Exception:
        return None
    finally:
        for _ in range(3):
            sys.path.pop(0)


class TestQuadF1ReferenceParity:
    """Drive the reference's QUADAPCalculator (imported verbatim) and ours
    on identical fixtures; F1 (plain + ceiling/floor-credited) and mAP/AR
    must agree."""

    @staticmethod
    def _fixtures(rng, n_scenes=4):
        scenes = []
        for _ in range(n_scenes):
            n_gt = rng.integers(2, 5)
            gts, preds = [], []
            for g in range(n_gt):
                x0 = rng.uniform(-4, 4)
                y0, y1 = sorted(rng.uniform(-4, 4, 2))
                z1 = rng.uniform(2.0, 3.0)
                gt = np.array([[x0, y0, z1], [x0, y1, z1],
                               [x0, y1, 0], [x0, y0, 0]], np.float32)
                gts.append(gt)
                r = rng.uniform()
                if r < 0.5:    # within SAME_THRES in order
                    preds.append(gt + rng.uniform(-0.1, 0.1, (4, 3)))
                elif r < 0.7:  # swapped order (the i^1 branch)
                    preds.append(gt[[1, 0, 3, 2]]
                                 + rng.uniform(-0.1, 0.1, (4, 3)))
                elif r < 0.85:  # miss
                    preds.append(gt + 1.5)
            for _ in range(rng.integers(0, 3)):  # spurious
                preds.append(rng.uniform(-5, 5, (4, 3)).astype(np.float32))
            horiz = np.stack([g + [0, 0, 0.01] for g in gts])
            pred_cls = [(0, evals.get_3d_box(rng.uniform(0.5, 2, 3),
                                             rng.uniform(0, 6.3),
                                             p.mean(0)), rng.uniform(0.2, 1))
                        for p in preds]
            gt_cls = [(0, evals.get_3d_box(rng.uniform(0.5, 2, 3),
                                           rng.uniform(0, 6.3), g.mean(0)))
                      for g in gts]
            scenes.append((pred_cls, gt_cls, preds, gts, horiz))
        return scenes

    def test_f1_and_map_match_reference(self, rng):
        ap = ref_ap_helper()
        if ap is None:
            pytest.skip("reference ap_helper_pq not importable")
        import torch
        ours = evals.QuadAPCalculator(0.25, {0: "quad"})
        theirs = ap.QUADAPCalculator(0.25, {0: "quad"})
        for pred_cls, gt_cls, preds, gts, horiz in self._fixtures(rng):
            ours.step([pred_cls], [gt_cls], [preds], [gts], [horiz])
            theirs.step([pred_cls], [gt_cls], [preds], [gts],
                        [torch.from_numpy(horiz)])
        for calculated in (False, True):
            got = ours.compute_F1(calculated=calculated)
            want = theirs.compute_F1(calculated=calculated)
            np.testing.assert_allclose(got, want, atol=1e-9), calculated
        got_m = ours.compute_metrics()
        want_m = theirs.compute_metrics()
        for k in ("mAP", "AR", "quad Average Precision", "quad Recall"):
            np.testing.assert_allclose(got_m[k], want_m[k], atol=1e-9)


class TestParseQuadReferenceParity:
    """Run the reference's parse_quad_predictions verbatim (torch CPU,
    .cuda() no-op) and ours on identical end_points: NMS keep mask, decoded
    8-corner boxes, 4-corner quads, and confidences must all agree."""

    def test_parse_matches_reference(self, rng):
        ap = ref_ap_helper()
        if ap is None:
            pytest.skip("reference ap_helper_pq not importable")
        import torch
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.cuda.FloatTensor = torch.FloatTensor

        B, K = 2, 12
        normal = rng.normal(size=(B, K, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        ep = {
            "last_quad_center": rng.uniform(-3, 3, (B, K, 3)).astype(np.float32),
            "last_quad_size": rng.uniform(0.5, 3, (B, K, 2)).astype(np.float32),
            "last_normal_vector": normal,
            "last_quad_scores": rng.normal(size=(B, K, 2)).astype(np.float32),
        }
        cfg = {"nms_iou": 0.25, "use_old_type_nms": False,
               "conf_thresh": 0.05}

        got_cls, got_mask, got_corners = evals.parse_quad_predictions(
            ep, cfg, prefix="last_")
        tep = {k: torch.from_numpy(v) for k, v in ep.items()}
        want_cls, want_mask, want_corners = ap.parse_quad_predictions(
            tep, cfg, prefix="last_")

        np.testing.assert_array_equal(got_mask, want_mask)
        for i in range(B):
            assert len(got_cls[i]) == len(want_cls[i])
            for (gc, gbox, gp), (wc, wbox, wp) in zip(got_cls[i], want_cls[i]):
                assert gc == wc
                np.testing.assert_allclose(gbox, wbox, atol=2e-5)
                np.testing.assert_allclose(gp, wp, atol=1e-6)
            assert len(got_corners[i]) == len(want_corners[i])
            for g4, w4 in zip(got_corners[i], want_corners[i]):
                np.testing.assert_allclose(g4, w4, atol=2e-5)

    def test_parse_gt_matches_reference(self, rng):
        ap = ref_ap_helper()
        if ap is None:
            pytest.skip("reference ap_helper_pq not importable")
        import torch
        torch.Tensor.cuda = lambda self, *a, **k: self

        B, K2 = 2, 32  # MAX_NUM_QUAD
        normal = rng.normal(size=(B, K2, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        ep = {
            "gt_quad_centers": rng.uniform(-3, 3, (B, K2, 3)).astype(np.float32),
            "gt_quad_sizes": rng.uniform(0.5, 3, (B, K2, 2)).astype(np.float32),
            "gt_normal_vectors": normal,
            # the reference indexes num arrays as [i, j] -> per-quad
            # replicated scalars, the dataset's actual layout
            "num_gt_quads": np.tile([[4], [2]], (1, K2)),
            "num_total_quads": np.tile([[6], [3]], (1, K2)),
        }
        got_cls, got_corners = evals.parse_quad_groundtruths(ep, {})
        tep = dict(ep)
        for k in ("gt_quad_centers", "gt_quad_sizes", "gt_normal_vectors"):
            tep[k] = torch.from_numpy(ep[k])
        want_cls, want_corners = ap.parse_quad_groundtruths(tep, {})
        for i in range(B):
            assert len(got_cls[i]) == len(want_cls[i])
            for (gc, gbox), (wc, wbox) in zip(got_cls[i], want_cls[i]):
                assert gc == wc
                np.testing.assert_allclose(gbox, wbox, atol=2e-5)
            assert len(got_corners[i]) == len(want_corners[i])
            for g4, w4 in zip(got_corners[i], want_corners[i]):
                np.testing.assert_allclose(g4, w4, atol=2e-5)


class TestParseObjectsReferenceParity:
    """parse_predictions (object boxes) vs the reference's code across all
    three NMS variants; remove_empty_box=False as in the reference drivers
    (train.py/eval.py set it False; our in-box test is a documented bbox
    approximation of extract_pc_in_box3d otherwise)."""

    class _DC:
        num_class = 18

        def class2angle(self, cls, residual):
            return float(residual)

        def class2size(self, cls, residual):
            return np.asarray(
                __import__("omni_pq_tpu.config", fromlist=["x"])
                .SCANNET_MEAN_SIZES)[int(cls)] + residual

    def _ep(self, rng, B=2, K=12):
        return {
            "last_center": rng.uniform(-3, 3, (B, K, 3)).astype(np.float32),
            "last_heading_scores": rng.normal(size=(B, K, 1)).astype(np.float32),
            "last_heading_residuals": rng.uniform(
                -0.3, 0.3, (B, K, 1)).astype(np.float32),
            "last_size_scores": rng.normal(size=(B, K, 18)).astype(np.float32),
            "last_size_residuals": rng.normal(
                size=(B, K, 18, 3)).astype(np.float32) * 0.1,
            "last_sem_cls_scores": rng.normal(size=(B, K, 18)).astype(np.float32),
            "last_objectness_scores": rng.normal(size=(B, K, 2)).astype(np.float32),
        }

    @pytest.mark.parametrize("variant", ["2d", "3d", "3d_cls"])
    def test_parse_predictions_matches_reference(self, rng, variant):
        ap = ref_ap_helper()
        if ap is None:
            pytest.skip("reference ap_helper_pq not importable")
        import torch
        torch.Tensor.cuda = lambda self, *a, **k: self

        ep = self._ep(rng)
        cfg = {"dataset_config": self._DC(), "remove_empty_box": False,
               "use_3d_nms": variant != "2d", "cls_nms": variant == "3d_cls",
               "use_old_type_nms": False, "nms_iou": 0.25,
               "conf_thresh": 0.05, "per_class_proposal": variant == "3d_cls"}
        got_cls, got_mask = evals.parse_predictions(ep, cfg, prefix="last_")
        tep = {k: torch.from_numpy(v) for k, v in ep.items()}
        want_cls, want_mask = ap.parse_predictions(tep, cfg, prefix="last_")
        np.testing.assert_array_equal(got_mask, want_mask)
        for i in range(len(got_cls)):
            assert len(got_cls[i]) == len(want_cls[i])
            for (gc, gbox, gp), (wc, wbox, wp) in zip(got_cls[i], want_cls[i]):
                assert gc == wc
                np.testing.assert_allclose(gbox, wbox, atol=2e-5)
                np.testing.assert_allclose(gp, wp, atol=1e-6)

    def test_parse_groundtruths_and_ap_match_reference(self, rng):
        """Object GT decode + the object APCalculator's mAP/AR/per-class
        numbers vs the reference's code on a shared prediction set."""
        ap = ref_ap_helper()
        if ap is None:
            pytest.skip("reference ap_helper_pq not importable")
        import torch
        torch.Tensor.cuda = lambda self, *a, **k: self

        B, K2 = 2, 10
        labels = {
            "center_label": rng.uniform(-3, 3, (B, K2, 3)).astype(np.float32),
            "heading_class_label": np.zeros((B, K2), np.int64),
            "heading_residual_label": rng.uniform(
                -0.3, 0.3, (B, K2)).astype(np.float32),
            "size_class_label": rng.integers(0, 18, (B, K2)),
            "size_residual_label": rng.normal(
                size=(B, K2, 3)).astype(np.float32) * 0.1,
            "sem_cls_label": rng.integers(0, 18, (B, K2)),
            "box_label_mask": (rng.uniform(size=(B, K2)) < 0.7
                               ).astype(np.float32),
        }
        cfg = {"dataset_config": self._DC()}
        got_gt = evals.parse_groundtruths(labels, cfg)
        tlab = {k: torch.from_numpy(np.asarray(v)) for k, v in labels.items()}
        want_gt = ap.parse_groundtruths(tlab, cfg)
        for i in range(B):
            assert len(got_gt[i]) == len(want_gt[i])
            for (gc, gbox), (wc, wbox) in zip(got_gt[i], want_gt[i]):
                assert gc == wc
                np.testing.assert_allclose(gbox, wbox, atol=2e-5)

        # predictions: GT boxes jittered + spurious, through both calculators
        pred = []
        for i in range(B):
            cur = [(c, box + rng.normal(scale=0.05, size=(8, 3)),
                    rng.uniform(0.3, 1.0)) for c, box in got_gt[i]]
            cur.append((int(rng.integers(0, 18)),
                        evals.get_3d_box(rng.uniform(0.5, 2, 3), 0.3,
                                         rng.uniform(-2, 2, 3)), 0.9))
            pred.append(cur)
        ours = evals.APCalculator(0.25, {i: str(i) for i in range(18)})
        theirs = ap.APCalculator(0.25, {i: str(i) for i in range(18)})
        ours.step(pred, got_gt)
        theirs.step(pred, want_gt)
        got_m, want_m = ours.compute_metrics(), theirs.compute_metrics()
        assert set(got_m) == set(want_m)
        for k in got_m:
            np.testing.assert_allclose(got_m[k], want_m[k], atol=1e-9,
                                       err_msg=k)
