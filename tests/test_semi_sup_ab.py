"""Tiny-scale variant of the semi-supervised A/B (scripts/semi_sup_ab.py).

The full-scale comparison (does EMA consistency / gamma-mixture move
HELD-OUT F1? — the reference's claim at README.md:108-116) runs on the TPU
and is recorded in docs/SEMI_SUP.md. This test exercises the same harness
shape at TINY scale on CPU: labeled pool + weak pool + held-out rooms,
three arms from the same init, fused single-dispatch steps, held-out F1
evaluation — asserting the mechanics (each arm trains, the semi-supervised
losses actually engage, held-out metrics compute) rather than the
comparative outcome, which needs full scale and thousands of steps.
"""
import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni_pq_tpu.config import SCANNET_MEAN_SIZES, DatasetConfig
from omni_pq_tpu.data.synthetic import SyntheticDataset
from omni_pq_tpu.evals import (parse_quad_predictions, parse_quad_groundtruths,
                               QuadAPCalculator)
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step, make_eval_step)
from tests.util import TINY

CONFIG_DICT = {"remove_empty_box": False, "use_3d_nms": True,
               "nms_iou": 0.25, "use_old_type_nms": False, "cls_nms": True,
               "per_class_proposal": False, "conf_thresh": 0.0,
               "nms_iou_quad": 0.25, "dataset_config": DatasetConfig()}

ROOM = dict(num_objects=2, w_range=(2.2, 2.6), d_range=(2.2, 2.6),
            h_range=(1.5, 1.8))
BS = 2
STEPS = 60

ARM_FLAGS = {
    "sup": dict(ema=False, gamma_mixture=False),
    "ema": dict(ema=True, gamma_mixture=False),
    "gamma": dict(ema=True, gamma_mixture=True, use_fitted_mixture=True),
}


def load_pool(seed, n):
    ds = SyntheticDataset(n, TINY.num_points, seed=seed, **ROOM)
    scenes = [ds[i] for i in range(n)]
    return {k: jnp.asarray(np.stack([s[k] for s in scenes]))
            for k in scenes[0] if k != "scan_idx"}


def held_out_f1(ev, state, val_pool):
    ep = ev(state, val_pool["point_clouds"])
    merged = {k: np.asarray(v) for k, v in ep.items()}
    merged.update({k: np.asarray(v) for k, v in val_pool.items()})
    pred_cls, _, pred_corners = parse_quad_predictions(merged, CONFIG_DICT,
                                                       "last_")
    gt_cls, gt_corners = parse_quad_groundtruths(merged, CONFIG_DICT)
    calc = QuadAPCalculator()
    calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
              list(np.asarray(val_pool["horizontal_quads"])))
    return calc.compute_F1(calculated=True)


@pytest.mark.slow
def test_semi_sup_ab_mechanics():
    cfg = dataclasses.replace(TINY, num_quad_proposal=32)
    model = PQTransformer(cfg)
    labeled = load_pool(100, 3)
    weak = load_pool(200, 4)
    val = load_pool(999, 2)
    n_lab, n_weak = 3, 4

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    labeled["point_clouds"][:BS])
    ev = make_eval_step(model)
    results = {}
    for arm, fl in ARM_FLAGS.items():
        flags = TrainFlags(arkit=False, pc_loss=False, near_threshold=0.8,
                           far_threshold=0.9, **fl)
        inner = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags)
        semi = flags.ema or flags.gamma_mixture

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused(state, lab_pool, weak_pool, key, _semi=semi, _inner=inner):
            key, k1, k2, k_step = jax.random.split(key, 4)
            il = jax.random.choice(k1, n_lab, (BS,), replace=False)
            lab = {k: v[il] for k, v in lab_pool.items()}
            if _semi:
                iw = jax.random.choice(k2, n_weak, (BS,), replace=False)
                wk = {k: v[iw] for k, v in weak_pool.items()}
            else:
                wk = lab
            return (*_inner(state, lab, wk, k_step, jnp.float32(0.05)), key)

        # fresh buffers per arm: fused donates the state, and the state's
        # initial buffers alias the shared `variables` tree
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, variables),
            OptimizerConfig(total_steps=STEPS, learning_rate=2e-3), ema=True)
        key = jax.random.PRNGKey(7)
        first_loss = None
        for i in range(STEPS):
            state, stats, key = fused(state, labeled, weak, key)
            if first_loss is None:
                first_loss = float(stats["total_loss"])
        last_loss = float(stats["total_loss"])
        f1 = held_out_f1(ev, state, val)
        results[arm] = stats

        assert np.isfinite(last_loss), (arm, last_loss)
        assert last_loss < first_loss, (arm, first_loss, last_loss)
        assert np.isfinite(f1), arm

    # the semi-supervised losses actually engaged on their arms
    assert "consistency_loss" not in results["sup"]
    assert float(results["ema"]["consistency_loss"]) > 0.0
    assert float(results["gamma"]["consistency_loss"]) > 0.0
    assert "metric_score" not in results["ema"]
    assert np.isfinite(float(results["gamma"]["gamma_mixture_filter_loss"]))
