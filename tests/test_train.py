"""Train-tier tests: optimizer grouping, schedules, the full jitted
semi-supervised train step on synthetic scenes, EMA, checkpointing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni_pq_tpu.config import SCANNET_MEAN_SIZES
from omni_pq_tpu.data.synthetic import make_batch, make_scene
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, TrainState,
                               create_train_state, make_train_step,
                               make_eval_step, warmup_cosine,
                               consistency_weight, save_checkpoint,
                               load_checkpoint)
from tests.util import TINY


def jbatch(rng, n=2, num_points=512):
    b = make_batch(rng, n, num_points, num_objects=3)
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    labeled = jbatch(rng)
    weak = jbatch(rng)
    model = PQTransformer(TINY)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    labeled["point_clouds"])
    return model, variables, labeled, weak


class TestSchedule:
    def test_cosine_matches_torch_formula(self):
        sched = warmup_cosine(2e-3, 100, warmup_steps=0)
        t = 40
        want = 1e-6 + (2e-3 - 1e-6) * 0.5 * (1 + np.cos(np.pi * t / 100))
        np.testing.assert_allclose(float(sched(t)), want, rtol=1e-6)
        np.testing.assert_allclose(float(sched(0)), 2e-3, rtol=1e-6)

    def test_warmup(self):
        sched = warmup_cosine(2e-3, 1000, warmup_steps=100, warmup_multiplier=100)
        np.testing.assert_allclose(float(sched(0)), 2e-5, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 2e-3, rtol=1e-5)
        assert float(sched(50)) < 2e-3

    def test_consistency_rampup(self):
        assert consistency_weight(0, 0.05, 10) < 0.001
        np.testing.assert_allclose(consistency_weight(10, 0.05, 10), 0.05)
        assert consistency_weight(5, 0.05, 10) < 0.05


class TestOptimizer:
    @pytest.mark.slow
    def test_decoder_group_gets_lower_lr(self, setup):
        model, variables, labeled, _ = setup
        state = create_train_state(variables, OptimizerConfig(total_steps=100))
        # one step with uniform fake grads: decoder params move less
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        new_state = state.apply_gradients(grads)
        # adam normalizes so step size == lr at t=0 (bias-corrected)
        base_delta = np.abs(np.asarray(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: a - b,
                                   state.params["vote"],
                                   new_state.params["vote"]))[0])).max()
        dec_delta = np.abs(np.asarray(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: a - b,
                                   state.params["decoder_layer0"],
                                   new_state.params["decoder_layer0"]))[0])).max()
        assert dec_delta < base_delta * 0.2


class TestTrainStep:
    @pytest.mark.slow
    def test_full_step_runs_and_improves(self, setup):
        model, variables, labeled, weak = setup
        flags = TrainFlags(ema=True, gamma_mixture=True, arkit=False,
                           pc_loss=True)
        state = create_train_state(variables, OptimizerConfig(total_steps=200))
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            rng, k = jax.random.split(rng)
            state, stats = step(state, labeled, weak, k, jnp.float32(0.05))
            losses.append(float(stats["total_loss"]))
        assert all(np.isfinite(losses))
        assert int(state.step) == 12
        # overfitting a fixed batch must reduce the loss
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    @pytest.mark.slow
    def test_ema_tracks_student(self, setup):
        model, variables, labeled, weak = setup
        flags = TrainFlags(ema=True, gamma_mixture=False, pc_loss=False)
        state = create_train_state(variables, OptimizerConfig(total_steps=200))
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        state2, _ = step(state, labeled, weak, jax.random.PRNGKey(1),
                         jnp.float32(0.0))
        # step 1: alpha = min(1-1/2, 0.999) = 0.5 -> ema halfway to student
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(state2.params)[0]
        e1 = jax.tree_util.tree_leaves(state2.ema_params)[0]
        np.testing.assert_allclose(np.asarray(e1),
                                   np.asarray(0.5 * p0 + 0.5 * p1), atol=1e-6)

    @pytest.mark.slow
    def test_donated_step_matches_undonated(self, setup):
        """donate=True (the driver path) must produce the identical update;
        the input state's buffers are consumed (freed in place)."""
        model, variables, labeled, weak = setup
        flags = TrainFlags(ema=True, gamma_mixture=False, pc_loss=False)
        fresh = lambda: create_train_state(
            jax.tree_util.tree_map(jnp.copy, variables),
            OptimizerConfig(total_steps=200))
        ref_step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        don_step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags,
                                   donate=True)
        s_ref, stats_ref = ref_step(fresh(), labeled, weak,
                                    jax.random.PRNGKey(3), jnp.float32(0.05))
        s_in = fresh()
        leaf = jax.tree_util.tree_leaves(s_in.params)[0]
        s_don, stats_don = don_step(s_in, labeled, weak,
                                    jax.random.PRNGKey(3), jnp.float32(0.05))
        np.testing.assert_allclose(float(stats_ref["total_loss"]),
                                   float(stats_don["total_loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(s_ref.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(s_don.params)[0]))
        assert leaf.is_deleted()  # the input tree really was donated

    @pytest.mark.slow
    def test_teacher_bf16_close_to_f32(self, setup):
        """teacher_bf16 runs the EMA forward in bfloat16 — the consistency
        loss (the only consumer of teacher outputs) must stay close to the
        f32-teacher value, and the supervised loss must be bit-identical
        (the student path is untouched)."""
        model, variables, labeled, weak = setup
        mk = lambda **kw: make_train_step(
            model, TINY, SCANNET_MEAN_SIZES,
            TrainFlags(ema=True, gamma_mixture=False, pc_loss=False, **kw))
        fresh = lambda: create_train_state(
            jax.tree_util.tree_map(jnp.copy, variables),
            OptimizerConfig(total_steps=200))
        _, s32 = mk()(fresh(), labeled, weak, jax.random.PRNGKey(5),
                      jnp.float32(0.05))
        _, s16 = mk(teacher_bf16=True)(fresh(), labeled, weak,
                                       jax.random.PRNGKey(5),
                                       jnp.float32(0.05))
        np.testing.assert_array_equal(np.asarray(s32["loss"]),
                                      np.asarray(s16["loss"]))
        # at random init the Chamfer student<->teacher matching is chaotic, so
        # bf16 teacher noise flips some assignments — the loss lands within
        # ~10-15%, not bitwise (measured 0.933 vs 0.871 on this fixture)
        np.testing.assert_allclose(float(s32["consistency_loss"]),
                                   float(s16["consistency_loss"]),
                                   rtol=0.15, atol=5e-4)

    def test_supervised_only_mode(self, setup):
        model, variables, labeled, _ = setup
        flags = TrainFlags(ema=False, gamma_mixture=False, arkit=False,
                           pc_loss=True)
        state = create_train_state(variables, OptimizerConfig(total_steps=200),
                                   ema=False)
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        state, stats = step(state, labeled, labeled, jax.random.PRNGKey(0),
                            jnp.float32(0.0))
        assert np.isfinite(float(stats["total_loss"]))
        assert "consistency_loss" not in stats

    @pytest.mark.slow
    def test_arkit_mode(self, setup):
        model, variables, labeled, weak = setup
        flags = TrainFlags(ema=False, gamma_mixture=False, arkit=True,
                           pc_loss=False, lambda_arkit_pc_loss=0.1)
        state = create_train_state(variables, OptimizerConfig(total_steps=200),
                                   ema=False)
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        state, stats = step(state, labeled, weak, jax.random.PRNGKey(0),
                            jnp.float32(0.0))
        assert np.isfinite(float(stats["arkit_pc_loss"]))

    @pytest.mark.slow
    def test_eval_step(self, setup):
        model, variables, labeled, _ = setup
        state = create_train_state(variables, OptimizerConfig(total_steps=10))
        ev = make_eval_step(model)
        ep = ev(state, labeled["point_clouds"])
        assert "last_quad_center" in ep
        ep_ema = ev(state, labeled["point_clouds"], use_ema=True)
        np.testing.assert_allclose(np.asarray(ep["last_quad_center"]),
                                   np.asarray(ep_ema["last_quad_center"]),
                                   atol=1e-5)  # identical params at init


class TestCheckpoint:
    @pytest.mark.slow
    def test_roundtrip(self, setup, tmp_path):
        model, variables, labeled, weak = setup
        state = create_train_state(variables, OptimizerConfig(total_steps=200))
        flags = TrainFlags(ema=True, gamma_mixture=False, pc_loss=False)
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        state, _ = step(state, labeled, weak, jax.random.PRNGKey(0),
                        jnp.float32(0.0))
        path = save_checkpoint(str(tmp_path), 5, state, epoch=5)
        fresh = create_train_state(variables, OptimizerConfig(total_steps=200))
        restored, epoch, tag = load_checkpoint(path, fresh)
        assert epoch == 5
        assert tag == ""
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
        assert int(restored.step) == 1

    def test_tag_sentinels(self, setup, tmp_path):
        model, variables, labeled, weak = setup
        state = create_train_state(variables, OptimizerConfig(total_steps=200))
        path = save_checkpoint(str(tmp_path), "ema_best", state, epoch=7)
        fresh = create_train_state(variables, OptimizerConfig(total_steps=200))
        _, epoch, tag = load_checkpoint(path, fresh)
        assert tag == "ema_best" and epoch == 0
        path = save_checkpoint(str(tmp_path), "last", state, epoch=9)
        _, epoch, tag = load_checkpoint(path, fresh)
        assert tag == "last" and epoch == 600


class TestSynthetic:
    def test_scene_shapes(self, rng):
        s = make_scene(rng, 512)
        assert s["point_clouds"].shape == (512, 3)
        assert s["vote_label"].shape == (512, 9)
        assert s["gt_quad_centers"].shape == (32, 3)
        assert s["num_gt_quads"] == 4
        # wall points sit on the quad planes
        assert np.isfinite(s["point_clouds"]).all()

    def test_votes_point_to_centers(self, rng):
        s = make_scene(rng, 2048, num_objects=3)
        m = s["vote_label_mask"].astype(bool)
        assert m.sum() > 0
        voted = s["point_clouds"][m] + s["vote_label"][m][:, :3]
        centers = s["center_label"][:int(s["num_gt_boxes"])]
        d = np.linalg.norm(voted[:, None] - centers[None], axis=-1).min(1)
        assert d.max() < 1e-5


class TestGradAccumulation:
    @pytest.mark.slow
    def test_step_freq_accumulates(self, setup):
        model, variables, labeled, weak = setup
        flags = TrainFlags(ema=False, gamma_mixture=False, pc_loss=False)
        state = create_train_state(
            variables, OptimizerConfig(total_steps=100, step_freq=2),
            ema=False)
        step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
        p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        state, _ = step(state, labeled, labeled, jax.random.PRNGKey(0),
                        jnp.float32(0.0))
        p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        # first micro-step: gradients accumulated, params unchanged
        np.testing.assert_array_equal(p0, p1)
        state, _ = step(state, labeled, labeled, jax.random.PRNGKey(1),
                        jnp.float32(0.0))
        p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        # second micro-step applies the update
        assert not np.allclose(p1, p2)


def test_lr_schedule_matches_reference_scheduler():
    """Step the reference's GradualWarmupScheduler + CosineAnnealingLR
    (utils/lr_scheduler.py, imported verbatim) through a whole training's
    iterations and assert our warmup_cosine reproduces the lr at every
    step, for both param groups."""
    import sys
    sys.path.insert(0, "/root/reference/utils")
    try:
        import lr_scheduler as ref_sched
    except Exception:
        pytest.skip("reference lr_scheduler not importable")
    finally:
        sys.path.pop(0)
    import torch

    from omni_pq_tpu.train.schedule import warmup_cosine

    n_iter_per_epoch, max_epoch, warmup_epoch, mult = 7, 12, 2, 100.0
    total = max_epoch * n_iter_per_epoch
    params = [torch.nn.Parameter(torch.zeros(1)) for _ in range(2)]
    opt = torch.optim.AdamW([{"params": [params[0]], "lr": 2e-3},
                             {"params": [params[1]], "lr": 1e-4}])

    class _Args:
        lr_scheduler = "cosine"
        warmup_epoch = 2
        warmup_multiplier = 100.0

    _Args.max_epoch = max_epoch
    sched = ref_sched.get_scheduler(opt, n_iter_per_epoch, _Args)

    ours = [warmup_cosine(lr, total_steps=total,
                          warmup_steps=warmup_epoch * n_iter_per_epoch,
                          warmup_multiplier=mult) for lr in (2e-3, 1e-4)]
    for step in range(total):
        for g, f in zip(opt.param_groups, ours):
            # our schedule computes in f32 on device; torch is f64 host —
            # tolerance covers the cosine tail near eta_min
            np.testing.assert_allclose(
                g["lr"], float(f(step)), rtol=1e-5, atol=1e-9,
                err_msg=f"step {step}")
        sched.step()


class TestEvalDecodeStep:
    """make_eval_decode_step: the packed (2-array) eval output must equal
    the full eval_step's end_points on every decode key, and the loss-stat
    vector must equal losses.get_loss on the merged dict."""

    def test_matches_full_eval_step(self):
        import functools
        from omni_pq_tpu.config import SCANNET_MEAN_SIZES
        from omni_pq_tpu.data.synthetic import make_batch
        from omni_pq_tpu.models import PQTransformer
        from omni_pq_tpu.train import (OptimizerConfig, create_train_state,
                                       make_eval_step, make_eval_decode_step,
                                       unpack_eval_outputs)
        from omni_pq_tpu import losses
        from tests.util import TINY

        model = PQTransformer(TINY)
        rng = np.random.default_rng(0)
        batch = make_batch(rng, 2, TINY.num_points)
        pc = jnp.asarray(batch["point_clouds"])
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc)
        state = create_train_state(variables, OptimizerConfig(total_steps=1))

        full = make_eval_step(model)(state, pc)
        step = make_eval_decode_step(model, SCANNET_MEAN_SIZES)
        labels = {k: np.asarray(v) for k, v in batch.items()
                  if getattr(np.asarray(v).dtype, "kind", "O") in "fiub"}
        obj, quad, vec = step(state, pc, labels, with_loss=True)
        ep = unpack_eval_outputs(np.asarray(obj), np.asarray(quad),
                                 TINY.num_heading_bin, TINY.num_size_cluster,
                                 TINY.num_class)
        for k, v in ep.items():
            np.testing.assert_array_equal(v, np.asarray(full[k]), err_msg=k)

        merged = dict(full)
        merged.update({k: jnp.asarray(v) for k, v in labels.items()})
        _, want_stats = jax.jit(lambda d: losses.get_loss(
            d, SCANNET_MEAN_SIZES,
            num_layer=TINY.num_decoder_layers))(
                {k: v for k, v in merged.items()})
        names = step.stat_names
        assert len(names) == len(np.asarray(vec))
        for name, got in zip(names, np.asarray(vec)):
            np.testing.assert_allclose(
                got, float(want_stats[name]), rtol=1e-5, atol=1e-6,
                err_msg=name)

        # ema variant runs and differs structurally nowhere
        obj2, quad2, vec2 = step(state, pc, use_ema=True, with_loss=False)
        assert vec2 is None and obj2.shape == obj.shape

    def test_topk_packing_lossless_when_count_fits(self):
        """Device-side confidence packing (VERDICT r4 ask #7): with
        quad_topk >= the per-scene count above the 0.5 gate, the decoded
        quad predictions, NMS picks, and F1 are identical to the full
        fetch; object AP keeps the same matches down to the truncated
        ranking tail (here: topk = full K so mAP is bitwise too)."""
        from omni_pq_tpu.config import DatasetConfig, SCANNET_MEAN_SIZES
        from omni_pq_tpu.data.synthetic import make_batch
        from omni_pq_tpu.models import PQTransformer
        from omni_pq_tpu.train import (OptimizerConfig, create_train_state,
                                       make_eval_decode_step,
                                       unpack_eval_outputs)
        from omni_pq_tpu.evals import (parse_quad_predictions,
                                       parse_quad_groundtruths,
                                       QuadAPCalculator)
        from tests.util import TINY

        model = PQTransformer(TINY)
        rng = np.random.default_rng(1)
        batch = make_batch(rng, 2, TINY.num_points)
        pc = jnp.asarray(batch["point_clouds"])
        variables = jax.jit(model.init)(jax.random.PRNGKey(1), pc)
        state0 = create_train_state(variables, OptimizerConfig(total_steps=1))

        # emulate a trained model's calibrated quadness (random init sits
        # near prob 0.5 everywhere — the documented keep-all worst case, not
        # the packing design point): measure the raw last_ quad logit
        # margins once, then shift every quad-score head's bias so each
        # scene keeps a FEW proposals above the 0.5 gate
        full_step = make_eval_decode_step(model, SCANNET_MEAN_SIZES)
        _, quad_raw, _ = full_step(state0, pc, with_loss=False)
        margins = np.asarray(quad_raw)[..., 1] - np.asarray(quad_raw)[..., 0]
        # target: every scene has >= 3 above the gate (3rd-largest margin
        # of the weakest scene becomes the new zero)
        s_target = float(np.min(np.sort(margins, axis=1)[:, -3]))

        def shift(tree):
            out = {}
            for k, v in tree.items():
                if k == "quad_scores_head":
                    v = dict(v, bias=v["bias"] + jnp.array(
                        [s_target / 2, -s_target / 2]))
                elif isinstance(v, dict):
                    v = shift(v)
                out[k] = v
            return out

        variables = {"params": shift(variables["params"]),
                     "batch_stats": variables["batch_stats"]}
        state = create_train_state(variables, OptimizerConfig(total_steps=1))
        kq = TINY.num_quad_proposal // 2
        topk_step = make_eval_decode_step(model, SCANNET_MEAN_SIZES,
                                          quad_topk=kq)
        obj_f, quad_f, _ = full_step(state, pc, with_loss=False)
        obj_t, quad_t, _ = topk_step(state, pc, with_loss=False)
        assert quad_t.shape[1] == kq
        # obj untouched when obj_topk=0
        np.testing.assert_array_equal(np.asarray(obj_t), np.asarray(obj_f))

        config_dict = {"remove_empty_box": False, "use_3d_nms": True,
                       "nms_iou": 0.25, "use_old_type_nms": False,
                       "cls_nms": True, "per_class_proposal": False,
                       "conf_thresh": 0.0, "quad_thresh": 0.5,
                       "nms_iou_quad": 0.25,
                       "dataset_config": DatasetConfig()}

        def decode(obj, quad):
            ep = unpack_eval_outputs(np.asarray(obj), np.asarray(quad),
                                     TINY.num_heading_bin,
                                     TINY.num_size_cluster, TINY.num_class)
            merged = dict(ep)
            merged.update({k: np.asarray(v) for k, v in batch.items()})
            pred_cls, _, corners = parse_quad_predictions(merged, config_dict,
                                                          "last_")
            gt_cls, gt_corners = parse_quad_groundtruths(merged, config_dict)
            calc = QuadAPCalculator()
            calc.step(pred_cls, gt_cls, corners, gt_corners,
                      list(batch["horizontal_quads"]))
            return pred_cls, corners, calc.compute_F1(calculated=True)

        # the losslessness precondition the host checks in production:
        # last kept row's prob below the gate (rows sorted desc)
        qf = np.asarray(quad_t)
        last_prob = (np.exp(qf[:, -1, 1])
                     / (np.exp(qf[:, -1, 0]) + np.exp(qf[:, -1, 1])))
        assert (last_prob < 0.5).all(), "fixture not trained-ish enough"
        # and the case is non-trivial: some proposals DO clear the gate
        allq = np.asarray(quad_f)
        probs = (np.exp(allq[..., 1])
                 / (np.exp(allq[..., 0]) + np.exp(allq[..., 1])))
        assert (probs > 0.5).any(axis=1).all()
        pred_f, corners_f, f1_f = decode(obj_f, quad_f)
        pred_t, corners_t, f1_t = decode(obj_f, quad_t)
        assert f1_t == f1_f
        # corner lists gate at 0.5: identical SETS of quads survive
        for a, b in zip(corners_f, corners_t):
            ka = sorted(np.asarray(x).tobytes() for x in a)
            kb = sorted(np.asarray(x).tobytes() for x in b)
            assert ka == kb
