"""Semi-supervised A/B: does the paper's machinery move HELD-OUT F1?

The reference's claim (README.md:108-116) is that EMA consistency + gamma-
mixture pseudo-labels beat the supervised baseline at low label rates
(e.g. 29.08 vs 22.43 F1 @5% labels). ScanNet is not on disk here, so this
runs the same-shaped experiment on synthetic rooms at full model scale
(40k points, 256+256 proposals, 6 decoder layers) on the real TPU:

  per seed s: 4 labeled rooms + 16 weak (unlabeled) rooms, 8 held-out val
  rooms shared by all seeds/arms; train three arms from the same init:
    sup   — supervised losses only, labeled rooms only
    ema   — + EMA mean-teacher consistency over labeled ‖ weak double batch
    gamma — + gamma-mixture pseudo-labels (fitted criterion: the fixed one
            is silent at early training, docs/FITTED_MIXTURE.md)
  evaluate held-out corner-F1 (ap_helper_pq.py:695-736 semantics) on a
  cadence; report per-arm best-over-trajectory F1 (the reference's
  best-checkpoint protocol) and medians over seeds.

Training regime mirrors train.sh:12-31 where it transfers: bs 3 labeled +
3 weak, AdamW + warmup-cosine, grad clip, EMA decay 0.999, consistency
weight 0.05 under sigmoid rampup over the first third of training,
lambda_metric_* = 5e-4. Rooms are 2.0-2.6 m so the fixed 0.3 m NEAR
assignment radius (loss_helper_pq.py:17) yields positives at this tiny
scene count (see scripts/convergence_tpu.py).

Round-5 arms (VERDICT asks #2/#6):
    gamma_fixed — gamma with the RECOMMENDED fixed criterion
            (use_fitted_mixture=False, reference fit.py:152-174 semantics)
    arkit — omni-supervised (README.md:113-116): ARKit-train-shaped weak
            scenes (object boxes only, quad GT zeroed), EMA + gamma +
            arkit physical-constraint loss at lambda 1e-3
    arkit_centered — arkit + the reference's ARKit scene-centering protocol
            (arkitscenes_dataset.py:106-118: offset = median xy of the
            cloud, subtracted so the scene straddles the origin). REQUIRED
            for the pc loss to be meaningful: arkit_loss_util.py:39 orients
            predicted normals toward a pseudo scene center hardcoded at
            (0,0,1), so on rooms placed away from the origin (this
            harness's default; synthetic.py keeps rooms off-origin for the
            FPS padding convention) near-side wall normals flip OUTWARD and
            every interior box corner is penalized even for PERFECT
            predictions — measured pc_loss 13.12 / 30 collisions on GT
            quads uncentered vs 0.23 / 2 centered. The uncentered `arkit`
            arm is retained as the measured negative (F1 collapses 0.41 ->
            0.08 once the semi phase engages the misfiring loss).
Any arm suffixed `_ft` runs the reference fine-tune protocol (supervised
pretrain -> teacher backfill -> semi phase at full consistency weight).

Run (TPU host):  python scripts/semi_sup_ab.py
Env: AB_STEPS (6000), AB_EVAL_EVERY (500), AB_SEEDS ("0,1,2"),
     AB_ARMS ("sup,ema,gamma"), AB_OUT (defaults by protocol:
     docs/semi_sup_ab.json for scratch arms, docs/semi_sup_ab_ft.json for
     _ft arms; required explicitly when AB_ARMS mixes the two)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from omni_pq_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

from omni_pq_tpu.config import ModelConfig, SCANNET_MEAN_SIZES, DatasetConfig
from omni_pq_tpu.data.synthetic import SyntheticDataset
from omni_pq_tpu.evals import (parse_quad_predictions, parse_quad_groundtruths,
                               QuadAPCalculator)
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step, make_eval_step)
from omni_pq_tpu.train.schedule import consistency_weight

CONFIG_DICT = {"remove_empty_box": False, "use_3d_nms": True,
               "nms_iou": 0.25, "use_old_type_nms": False, "cls_nms": True,
               "per_class_proposal": False, "conf_thresh": 0.0,
               "nms_iou_quad": 0.25, "dataset_config": DatasetConfig()}

STEPS = int(os.environ.get("AB_STEPS", 6000))
EVAL_EVERY = int(os.environ.get("AB_EVAL_EVERY", 500))
SEEDS = [int(s) for s in os.environ.get("AB_SEEDS", "0,1,2").split(",")]
ARMS = os.environ.get("AB_ARMS", "sup,ema,gamma").split(",")
# Route results by protocol so scripts/semi_sup_report.py (which reads the
# two protocol files BY NAME) can never render fine-tune runs under
# "Protocol A": _ft arms default to the ft JSON, scratch arms to the scratch
# JSON, and mixing protocols in one invocation requires an explicit AB_OUT.
OUT = os.environ.get("AB_OUT")
if OUT is None:
    _ft_arms = [a for a in ARMS if a.endswith("_ft")]
    if _ft_arms and len(_ft_arms) != len(ARMS):
        raise SystemExit("AB_ARMS mixes scratch and _ft protocols; "
                         "set AB_OUT explicitly")
    OUT = ("docs/semi_sup_ab_ft.json" if _ft_arms
           else "docs/semi_sup_ab.json")

N_LABELED, N_WEAK, N_VAL = 4, 16, 8
BS = 3  # labeled batch (train.sh batch_size); weak batch equals it
ROOM = dict(num_objects=3, w_range=(2.0, 2.6), d_range=(2.0, 2.6),
            h_range=(2.0, 2.4))

ARM_FLAGS = {
    "sup": TrainFlags(ema=False, gamma_mixture=False, arkit=False,
                      pc_loss=True),
    "ema": TrainFlags(ema=True, gamma_mixture=False, arkit=False,
                      pc_loss=True),
    "gamma": TrainFlags(ema=True, gamma_mixture=True, arkit=False,
                        pc_loss=True, use_fitted_mixture=True),
    # the criterion RECOMMENDED for parity runs (docs/FITTED_MIXTURE.md):
    # label with the mixture's INITIAL parameters, the reference's effective
    # semantics (fit.py:152-174 — labels computed before the EM loop)
    "gamma_fixed": TrainFlags(ema=True, gamma_mixture=True, arkit=False,
                              pc_loss=True, use_fitted_mixture=False),
    # omni-supervised (README.md:113-116): weak scenes are ARKit-train-
    # shaped (object boxes only — the quad GT of the weak pool is zeroed in
    # run_arm), EMA + gamma on them, plus the arkit physical-constraint loss
    # (train.py:536-538 -> arkit_loss_util.py:5-52). The reference CLI
    # defaults lambda_arkit_pc_loss to 0.0 (train.sh:30) and publishes no
    # value; 1e-3 keeps the term the same order as the lambda_metric_*
    # gamma weights and demonstrably engaged (arkit_pc_loss stat).
    "arkit": TrainFlags(ema=True, gamma_mixture=True, arkit=True,
                        pc_loss=True, use_fitted_mixture=True,
                        lambda_arkit_pc_loss=1e-3),
    # identical flags; the arm differs only in the data protocol (scene
    # centering, see module docstring / _center_pool)
    "arkit_centered": TrainFlags(ema=True, gamma_mixture=True, arkit=True,
                                 pc_loss=True, use_fitted_mixture=True,
                                 lambda_arkit_pc_loss=1e-3),
}

# per-scene absolute-coordinate keys (everything else is relative: votes,
# normals, sizes, masks, aug params)
_ABS_KEYS = ("point_clouds", "ema_point_clouds", "center_label",
             "gt_quad_centers", "horizontal_quads")


def _center_pool(pool):
    """Reference ARKit centering (arkitscenes_dataset.py:109-118): shift each
    scene by the median xy of its cloud so the scene straddles the origin —
    ONE rigid translation per scene applied to the cloud, the teacher view,
    and every absolute-coordinate label (the reference computes the offset
    once from the mesh and subtracts it from the labels; z stays, floors are
    already at z=0 so the (0,0,1) pseudo center sits mid-wall). FPS's
    ||p||^2 <= 1e-3 padding skip only hides floor points within ~3 cm of the
    exact origin — a handful of the 40k."""
    med = np.median(pool["point_clouds"][..., :2], axis=1)  # (n, 2)
    shift = np.concatenate([med, np.zeros((med.shape[0], 1))],
                           axis=1).astype(np.float32)  # (n, 3)
    out = dict(pool)
    for k in _ABS_KEYS:
        v = pool[k]
        s = shift.reshape((v.shape[0],) + (1,) * (v.ndim - 2) + (3,))
        if k in ("gt_quad_centers", "horizontal_quads"):
            # don't drag zero-PADDING rows into the (now origin-straddling)
            # room as degenerate geometry — shift only real entries
            valid = (np.abs(v).sum(axis=-1, keepdims=True) > 0)
            out[k] = np.where(valid, v - s, v)
        else:
            out[k] = v - s
    return out

# weak-pool keys that do not exist for ARKit train-split scenes
# (arkitscenes_dataset.py:42-233 returns object boxes only)
QUAD_GT_KEYS = ("gt_quad_centers", "gt_quad_sizes", "gt_normal_vectors",
                "num_gt_quads", "num_total_quads", "horizontal_quads")

# "<arm>_ft" = the reference's ACTUAL protocol (train.sh:14-31): a
# supervised pretrain, then resume with the semi-supervised machinery on —
# teacher backfilled from the student (train.py:167-173), consistency at
# full weight immediately (the resume epoch is far past consistency_rampup,
# so sigmoid_rampup saturates at 1). AB_PRETRAIN steps of phase 1.
PRETRAIN = int(os.environ.get("AB_PRETRAIN", STEPS // 2))


def load_pool(seed, n):
    ds = SyntheticDataset(n, 40000, seed=seed, **ROOM)
    scenes = [ds[i] for i in range(n)]
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]
            if k != "scan_idx"}


QUAD_KEYS = ("last_quad_center", "last_quad_size", "last_normal_vector",
             "last_quad_scores")


def held_out_f1(ev, state, val_batch_dev, val_np, use_ema=False):
    ep = ev(state, val_batch_dev, use_ema=use_ema)
    # fetch ONLY the quad-decode keys: each per-array fetch through the
    # axon tunnel costs ~32 ms and the full end_points dict has ~119 arrays
    merged = {k: np.asarray(ep[k]) for k in QUAD_KEYS}
    merged.update(val_np)
    pred_cls, _, pred_corners = parse_quad_predictions(merged, CONFIG_DICT,
                                                       "last_")
    gt_cls, gt_corners = parse_quad_groundtruths(merged, CONFIG_DICT)
    calc = QuadAPCalculator()
    calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
              list(val_np["horizontal_quads"]))
    return calc.compute_F1(calculated=True)


def make_fused_step(inner_step, n_labeled, n_weak, semi):
    """ONE dispatch per train step with ZERO per-step host->device
    transfers: batch index sampling (on-device PRNG), pool gather, the
    consistency-weight schedule lookup (on-device step counter), the full
    train step, and key threading fused into a single jit whose per-step
    arguments are all device-resident or chained from the previous step.
    Through the axon tunnel every separate dispatch or fresh host transfer
    costs ~30+ ms; the unfused loop measured 0.3-1.3 s/step vs the 145 ms
    step itself."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(state, lab_pool, weak_pool, cw_sched, key, istep):
        key, k1, k2, k_step = jax.random.split(key, 4)
        il = jax.random.choice(k1, n_labeled, (BS,), replace=False)
        lab = {k: v[il] for k, v in lab_pool.items()}
        if semi:
            iw = jax.random.choice(k2, n_weak, (BS,), replace=False)
            weak = {k: v[iw] for k, v in weak_pool.items()}
        else:
            weak = lab
        state, stats = inner_step(state, lab, weak, k_step, cw_sched[istep])
        return state, stats, key, istep + 1
    return fused


def run_arm(arm, seed, labeled_pool, weak_pool, val_dev, val_np):
    cfg = ModelConfig()
    model = PQTransformer(cfg)
    finetune = arm.endswith("_ft")
    base_arm = arm[:-3] if finetune else arm
    if base_arm == "arkit_centered":
        # the reference ARKit data protocol: scenes straddle the origin
        # (arkitscenes_dataset.py:109-118) — applied to ALL pools so the
        # arm is self-consistent; F1 is translation-invariant so the
        # cross-arm comparison is unchanged
        labeled_pool = _center_pool(labeled_pool)
        weak_pool = _center_pool(weak_pool)
        val_np = _center_pool(val_np)
        val_dev = jnp.asarray(val_np["point_clouds"])
    if base_arm in ("arkit", "arkit_centered"):
        # ARKit train split carries NO quad annotations — zero them so the
        # weak half is shape-identical to arkitscenes_dataset.py's output
        # and nothing can leak (no loss reads them today; this pins it)
        weak_pool = {k: (np.zeros_like(v) if k in QUAD_GT_KEYS else v)
                     for k, v in weak_pool.items()}
    labeled_pool = {k: jnp.asarray(v) for k, v in labeled_pool.items()}
    weak_pool = {k: jnp.asarray(v) for k, v in weak_pool.items()}
    init_pc = labeled_pool["point_clouds"][:BS]
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), init_pc)
    state = create_train_state(
        variables, OptimizerConfig(total_steps=STEPS, learning_rate=2e-3),
        ema=True)
    flags = ARM_FLAGS[base_arm]
    inner = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags,
                            donate=False)
    step = make_fused_step(inner, N_LABELED, N_WEAK,
                           semi=flags.ema or flags.gamma_mixture)
    if finetune:
        sup_inner = make_train_step(model, cfg, SCANNET_MEAN_SIZES,
                                    ARM_FLAGS["sup"], donate=False)
        sup_step = make_fused_step(sup_inner, N_LABELED, N_WEAK, semi=False)
    ev = make_eval_step(model)

    ramp_steps = max(1, STEPS // 3)
    if finetune:
        # reference resume semantics: full consistency weight from the
        # first fine-tune step (rampup long saturated at the resume epoch)
        cw_sched = jnp.asarray(
            [0.0] * PRETRAIN + [0.05] * (STEPS - PRETRAIN), jnp.float32)
    else:
        cw_sched = jnp.asarray([
            consistency_weight(i / ramp_steps, 0.05, 1) if flags.ema else 0.0
            for i in range(STEPS)], dtype=jnp.float32)
    key = jax.random.PRNGKey(1009 * seed
                             + {"sup": 1, "ema": 2, "gamma": 3,
                                "gamma_fixed": 4, "arkit": 5,
                                "arkit_centered": 6}[base_arm]
                             + (7000 if finetune else 0))
    istep = jnp.int32(0)
    curve = []
    t0 = time.time()
    for i in range(STEPS):
        if finetune and i == PRETRAIN:
            # teacher backfill at resume (train.py:167-173)
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params),
                ema_batch_stats=jax.tree.map(jnp.copy, state.batch_stats))
            phase = ("semi-supervised phase begins"
                     if (flags.ema or flags.gamma_mixture or flags.arkit)
                     else "supervised fine-tune phase continues (baseline)")
            print(f"  [{arm} s{seed}] step {i}: teacher backfilled, "
                  f"{phase}", flush=True)
        use = sup_step if (finetune and i < PRETRAIN) else step
        state, stats, key, istep = use(state, labeled_pool, weak_pool,
                                       cw_sched, key, istep)
        if (i + 1) % 50 == 0:  # bound the dispatch queue
            loss = float(stats["total_loss"])
        if (i + 1) % EVAL_EVERY == 0 or i == 0:
            te = time.time()
            f1 = held_out_f1(ev, state, val_dev, val_np)
            rec = {"step": i + 1, "f1": f1,
                   "loss": float(stats["total_loss"])}
            # evidence the omni-supervised term is engaged (absent during a
            # fine-tune arm's supervised pretrain phase, which runs the
            # plain sup step)
            if flags.arkit and "arkit_pc_loss" in stats:
                rec["arkit_pc_loss"] = float(stats["arkit_pc_loss"])
                rec["arkit_collisions"] = float(stats["arkit_collisions"])
            if flags.gamma_mixture and "gamma_engaged_frac" in stats:
                rec["gamma_engaged_frac"] = float(
                    stats["gamma_engaged_frac"])
            in_semi = flags.ema and not (finetune and i < PRETRAIN)
            if in_semi:
                rec["f1_ema"] = held_out_f1(ev, state, val_dev, val_np,
                                            use_ema=True)
            curve.append(rec)
            print(f"  [{arm} s{seed}] step {i + 1}: heldout F1 {f1:.3f}"
                  + (f" ema {rec['f1_ema']:.3f}" if in_semi else "")
                  + f" loss {rec['loss']:.3f} ({time.time() - t0:.0f}s, "
                  f"eval {time.time() - te:.1f}s)", flush=True)
    best = max(max(r["f1"], r.get("f1_ema", 0.0)) for r in curve)
    return {"arm": arm, "seed": seed, "best_f1": best,
            "final_f1": curve[-1]["f1"],
            "final_f1_ema": curve[-1].get("f1_ema"), "curve": curve,
            "wall_s": round(time.time() - t0, 1)}


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    # held-out rooms fixed across seeds and arms
    val_np = load_pool(999, N_VAL)
    val_dev = jnp.asarray(val_np["point_clouds"])

    results = []
    if os.path.exists(OUT):  # resume across interrupted runs
        results = json.load(open(OUT))["runs"]
        done = {(r["arm"], r["seed"]) for r in results}
        print(f"resuming: {len(results)} runs already done", flush=True)
    else:
        done = set()

    for seed in SEEDS:
        labeled_pool = load_pool(100 + seed, N_LABELED)
        weak_pool = load_pool(200 + seed, N_WEAK)
        for arm in ARMS:
            if (arm, seed) in done:
                continue
            print(f"=== arm {arm} seed {seed} ===", flush=True)
            r = run_arm(arm, seed, labeled_pool, weak_pool, val_dev, val_np)
            results.append(r)
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            with open(OUT, "w") as f:
                json.dump({"steps": STEPS, "setup": {
                    "labeled": N_LABELED, "weak": N_WEAK, "val": N_VAL,
                    "room": {k: list(v) if isinstance(v, tuple) else v
                             for k, v in ROOM.items()}},
                    "runs": results}, f, indent=1)

    for arm in ARMS:
        vals = sorted(r["best_f1"] for r in results if r["arm"] == arm)
        if vals:
            print(f"{arm}: best-F1 per seed {vals} median "
                  f"{vals[len(vals) // 2]:.3f}", flush=True)
    import subprocess
    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "semi_sup_report.py")])


if __name__ == "__main__":
    main()
