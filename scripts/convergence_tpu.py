"""Full-scale detection-quality demonstration on TPU.

Overfits the FULL PQ-Transformer (40k points, 256+256 proposals, 6 decoder
layers) on 4 fixed synthetic rooms under the reference's default training
losses and its default 0.3/0.6 m assignment radii (loss_helper_pq.py:17-18),
evaluating the quad corner-F1 (ap_helper_pq.py:695-736 semantics) on those
rooms as training proceeds. Rooms are drawn at 2.0-2.6 m so FPS quad queries
land within the fixed 0.3 m NEAR radius of wall centers (the ScanNet-size
default of 3-7 m leaves positives too sparse to overfit 4 scenes quickly —
the reference trains for 1200 epochs on 1201 scenes to cover that).

Writes docs/CONVERGENCE.md with the F1-vs-step curve.

Run (on the TPU host):  python scripts/convergence_tpu.py
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
from omni_pq_tpu.data.synthetic import make_batch
from omni_pq_tpu.evals import (parse_quad_predictions, parse_quad_groundtruths,
                               QuadAPCalculator)
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step, make_eval_step)

CONFIG_DICT = {"remove_empty_box": False, "use_3d_nms": True,
               "nms_iou": 0.25, "use_old_type_nms": False, "cls_nms": True,
               "per_class_proposal": False, "conf_thresh": 0.0,
               "nms_iou_quad": 0.25, "dataset_config": DatasetConfig()}

TOTAL_STEPS = int(os.environ.get("CONV_STEPS", 6000))
EVAL_EVERY = int(os.environ.get("CONV_EVAL_EVERY", 500))
# CONV_BF16=1 runs the model in bfloat16 compute (the --bf16 CLI mode) — the
# accuracy-side evidence for the mixed-precision speed numbers
BF16 = os.environ.get("CONV_BF16", "") == "1"


def quad_f1(ev, state, batch, np_batch):
    ep = ev(state, batch["point_clouds"])
    merged = {k: np.asarray(v) for k, v in ep.items()}
    merged.update(np_batch)
    pred_cls, _, pred_corners = parse_quad_predictions(merged, CONFIG_DICT,
                                                       "last_")
    gt_cls, gt_corners = parse_quad_groundtruths(merged, CONFIG_DICT)
    calc = QuadAPCalculator()
    calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
              list(np_batch["horizontal_quads"]))
    f1 = calc.compute_F1(calculated=True)
    tp = fp = 0
    for i in range(calc.scan_cnt):
        for pc_ in calc.pred_corners[i]:
            if calc.compute_correctness(pc_, calc.gt_corners[i]):
                tp += 1
            else:
                fp += 1
    return f1, tp, fp


def run_seed(seed, cfg, batch, np_batch):
    import functools

    model = PQTransformer(cfg)
    print(f"init (seed {seed})...", flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                    batch["point_clouds"])
    state = create_train_state(
        variables, OptimizerConfig(total_steps=TOTAL_STEPS,
                                   learning_rate=2e-3), ema=True)
    flags = TrainFlags(ema=False, gamma_mixture=False, arkit=False,
                       pc_loss=True)  # reference default radii 0.3/0.6
    inner = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags)
    ev = make_eval_step(model)

    # one dispatch per step: thread the PRNG key on-device (each separate
    # dispatch through the axon tunnel costs ~30 ms of fixed overhead)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        key, k = jax.random.split(key)
        state, stats = inner(state, batch, batch, k, jnp.float32(0.0))
        return state, stats, key

    curve = []
    key = jax.random.PRNGKey(1000 + seed)
    t0 = time.time()
    for i in range(TOTAL_STEPS):
        state, stats, key = step(state, batch, key)
        if (i + 1) % EVAL_EVERY == 0 or i == 0:
            f1, tp, fp = quad_f1(ev, state, batch, np_batch)
            loss = float(stats["total_loss"])
            curve.append({"step": i + 1, "f1": f1, "tp": tp, "fp": fp,
                          "loss": loss})
            print(f"[seed {seed}] step {i + 1}: F1 {f1:.3f} tp {tp} fp {fp} "
                  f"loss {loss:.3f} ({time.time() - t0:.0f}s)", flush=True)
    return curve


def main():
    cfg = ModelConfig(compute_dtype="bfloat16" if BF16 else "float32")
    rng = np.random.default_rng(7)
    # 2.0-2.6 m rooms put ~8 FPS queries/m^2 on the surfaces, i.e. ~2
    # positive queries per wall under the fixed 0.3 m radius (at the
    # ScanNet-size default of 3-7 m positives are ~0.7/wall and the
    # overfit needs the reference's full 1200-epoch regime to bite)
    np_batch = make_batch(rng, 4, cfg.num_points, num_objects=3,
                          w_range=(2.0, 2.6), d_range=(2.0, 2.6),
                          h_range=(2.0, 2.4))
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}

    seeds = [int(s) for s in os.environ.get("CONV_SEEDS", "0").split(",")]
    curves = {s: run_seed(s, cfg, batch, np_batch) for s in seeds}
    # median trajectory over seeds (the headline; single trajectories carry
    # FPS argmax ULP tie-flip noise — see docs/CONVERGENCE.md)
    steps = [c["step"] for c in curves[seeds[0]]]
    median = [{"step": st,
               "f1": float(np.median([curves[s][i]["f1"] for s in seeds])),
               "loss": float(np.median([curves[s][i]["loss"] for s in seeds]))}
              for i, st in enumerate(steps)]

    out = {"config": "full PQ-Transformer, 40k pts, 4 synthetic rooms "
                     "(2.0-2.6 m), NEAR/FAR = reference default 0.3/0.6 m, "
                     "supervised losses incl. physical constraints",
           "seeds": seeds,
           "curves": {str(s): c for s, c in curves.items()},
           "median_curve": median}
    os.makedirs("docs", exist_ok=True)
    suffix = "_bf16" if BF16 else ""
    with open(f"docs/convergence_curve{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    write_doc(curves, seeds, median)


def write_doc(curves, seeds, curve):
    suffix = "_bf16" if BF16 else ""
    title = "# Detection-quality convergence (full scale, real TPU)"
    cmd = "python scripts/convergence_tpu.py"
    if BF16:
        title += " — bfloat16 mode"
        cmd = "CONV_BF16=1 CONV_STEPS=12000 " + cmd
    lines = [title, "",
             f"Command: `{cmd}` (one v5e chip).",
             ""]
    if BF16:
        lines += ["Same setup as docs/CONVERGENCE.md but the model runs in "
                  "bfloat16 compute (the `--bf16` CLI mode: Dense/BN/"
                  "attention in bf16; params, losses, coordinates, Pallas "
                  "kernels stay f32).", ""]
    lines += [
             "Setup: the flagship model at the full reference scale "
             "(40k points, 256 object + 256 quad proposals, 6 decoder "
             "layers), overfitting 4 fixed synthetic rooms (2.0-2.6 m) with "
             "the reference's supervised losses and its default 0.3/0.6 m "
             "GT-assignment radii. Metric: quad corner-F1 with NMS, 0.5 "
             "confidence gate, 0.40 m corner matching and ceiling/floor "
             "synthesis — the exact semantics of ap_helper_pq.py:695-736. "
             "npos counts `num_total_quads` = 6 per room (the reference's "
             "recall-denominator inflation), so 16 matched walls / 24 give "
             "recall 0.667.",
             "",
             f"Seeds: {seeds} (model init + training PRNG; rooms fixed). "
             "Per-seed trajectories carry FPS hardware argmax ULP tie-flip "
             "noise; the median column is the headline.",
             "",
             "| step | " + " | ".join(f"F1 s{s}" for s in seeds)
             + " | median F1 | median loss |",
             "|---" * (len(seeds) + 3) + "|"]
    for i, c in enumerate(curve):
        per_seed = " | ".join(f"{curves[s][i]['f1']:.3f}" for s in seeds)
        lines.append(f"| {c['step']} | {per_seed} | {c['f1']:.3f} | "
                     f"{c['loss']:.3f} |")
    if BF16:
        best = {s: max(c["f1"] for c in curves[s]) for s in seeds}
        bests = " / ".join(f"{best[s]:.3f}" for s in seeds)
        lines += ["",
                  "This is the accuracy evidence behind the bfloat16-"
                  "by-default decision: the bf16 trajectories are the same "
                  "family as f32's (docs/CONVERGENCE.md) — best-over-"
                  f"trajectory F1 {bests} per seed (median "
                  f"{np.median(list(best.values())):.3f}) vs the f32 "
                  "extended run's 0.750 at the same 12k-step budget, with "
                  "the same ULP tie-flip seed noise. Opt out with `--f32`.",
                  ""]
        # the round-4/5 default numerics changed twice after the original
        # bf16 promotion evidence (searchsorted ball-query deposit,
        # promise_in_bounds fusion regrouping, decoder LayerNorm eps pinned
        # to torch's 1e-5) — when the pre-change curves are on disk, show
        # the re-validation side by side (VERDICT r4 ask #5)
        prev_path = "docs/convergence_curve_bf16_r3.json"
        if os.path.exists(prev_path):
            with open(prev_path) as f:
                prev = json.load(f)
            pbest = {int(s): max(c["f1"] for c in prev["curves"][str(s)])
                     for s in prev["seeds"]}
            # column set = union of the two runs' seeds, so a fresh run
            # with CONV_SEEDS != the round-3 set can't shift its cells
            # under the wrong header
            all_seeds = sorted(set(pbest) | set(int(s) for s in seeds))

            def _row(vals):
                return " | ".join(f"{vals[s]:.3f}" if s in vals else "—"
                                  for s in all_seeds)
            lines += ["## Re-validation at the current default numerics",
                      "",
                      "The kernels and defaults changed after the original "
                      "promotion run (round 3): the searchsorted ball-query "
                      "rank deposit, `promise_in_bounds` gathers (XLA "
                      "fusion regrouping), and the decoder LayerNorm eps "
                      "pinned to torch's 1e-5. The table above is a fresh "
                      "run at the current defaults; the round-3 curves are "
                      f"preserved in `{prev_path}`:",
                      "",
                      "| | " + " | ".join(f"best F1 s{s}"
                                          for s in all_seeds)
                      + " | median |",
                      "|---" * (len(all_seeds) + 2) + "|",
                      f"| round 3 (promotion run) | {_row(pbest)} | "
                      f"{np.median(list(pbest.values())):.3f} |",
                      f"| current defaults | {_row(best)} | "
                      f"{np.median(list(best.values())):.3f} |",
                      ""]
    else:
        lines += ["",
                  "## Extended single-seed run (12000 steps, round 2)",
                  "",
                  "`CONV_STEPS=12000` with seed 0 on the shipped kernels "
                  "kept climbing past the 6k cutoff: F1 0.512 @ 6k, 0.667 "
                  "@ 8k, 0.720 @ 10k, **0.750 @ 11k-12k** (18 of the 24 "
                  "countable quads matched at 0.40 m corner tolerance, 6 "
                  "false positives), with monotonically falling loss "
                  "(0.022 at 12k). The multi-seed table above is the "
                  "robustness evidence; the extended run is the capability "
                  "ceiling at this overfit-4-rooms scale.",
                  ""]
    lines += ["A tiny-scale CPU variant of this demonstration runs as "
              "`pytest tests/test_convergence.py -m slow` (raised radii, "
              "documented in the test).", ""]
    with open(f"docs/CONVERGENCE{suffix}.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote docs/CONVERGENCE{suffix}.md")


def redoc():
    """Regenerate the doc from the saved JSON (no TPU run)."""
    suffix = "_bf16" if BF16 else ""
    with open(f"docs/convergence_curve{suffix}.json") as f:
        out = json.load(f)
    seeds = out["seeds"]
    curves = {s: out["curves"][str(s)] for s in seeds}
    write_doc(curves, seeds, out["median_curve"])


if __name__ == "__main__":
    redoc() if "--redoc" in sys.argv else main()
