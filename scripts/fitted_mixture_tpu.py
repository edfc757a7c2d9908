"""VERDICT r1 #10: run the paper-intent `use_fitted_mixture=True` path at
full scale on the real TPU and compare it against the reference's effective
(fixed-criterion) behavior.

Background (omni_pq_tpu/losses/gamma.py docstring): the reference's fit_gamma
runs 25 scipy EM steps per scene per step but labels points with the INITIAL
mixture parameters — the fit never affects the keep-mask, so the shipped
behavior is a fixed closed-form criterion. `use_fitted_mixture=True` is this
framework's switch that actually applies the on-device EM fit (the paper's
stated intent). This script trains the flagship model twice from the same
init on the same synthetic weak batches — once per criterion — and records:

  - the 4 gamma-metric trajectories (normal / vertical / size / score)
  - total-loss trajectories
  - steady-state step time for both (i.e. the measured cost of 2x 25-step
    on-device EM per scene per step)

Output: docs/fitted_mixture_curves.json + docs/FITTED_MIXTURE.md.
Run: python scripts/fitted_mixture_tpu.py   (TPU box, ~15 min incl. compiles)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("FM_STEPS", 60))
CHECK_EVERY = 5
# supervised-only steps run FIRST from the shared init; both criterion runs
# then start from that pretrained state — the reference's actual regime
# (train.sh:14-31 resumes gamma fine-tuning from a supervised base), where
# the fixed keep-mask plausibly passes the >= 300-point gate (VERDICT r3 #6)
PRETRAIN = int(os.environ.get("FM_PRETRAIN", 0))


def pretrain(batches, model, cfg, variables, steps):
    """Supervised-only pretraining shared by both criterion runs."""
    import jax
    import jax.numpy as jnp
    from omni_pq_tpu.config import SCANNET_MEAN_SIZES
    from omni_pq_tpu.train import (TrainFlags, OptimizerConfig,
                                   create_train_state, make_train_step)

    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables),
        OptimizerConfig(total_steps=steps + STEPS))
    flags = TrainFlags(ema=False, gamma_mixture=False, pc_loss=True)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags,
                           donate=True)
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, stats = step(state, batches[i % len(batches)][0],
                            batches[i % len(batches)][0], k,
                            jnp.float32(0.0))
        if (i + 1) % 50 == 0:
            loss = float(stats["total_loss"])
            print(f"[pretrain] step {i + 1}/{steps} loss {loss:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return {"params": state.params, "batch_stats": state.batch_stats}


def run(flags_kw, batches, model, cfg, variables, label):
    import jax
    import jax.numpy as jnp
    from omni_pq_tpu.config import SCANNET_MEAN_SIZES
    from omni_pq_tpu.train import (TrainFlags, OptimizerConfig,
                                   create_train_state, make_train_step)

    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables),
        OptimizerConfig(total_steps=STEPS))
    flags = TrainFlags(ema=True, gamma_mixture=True, pc_loss=True, **flags_kw)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags, donate=True)

    key = jax.random.PRNGKey(7)
    curve = []
    pending = []  # (step, on-device stats) fetched in one sync at the end
    t_compile = time.time()
    t_loop = None
    for i in range(STEPS):
        key, k = jax.random.split(key)
        state, stats = step(state, batches[i % len(batches)][0],
                            batches[i % len(batches)][1], k,
                            jnp.float32(0.05))
        if i == 0:
            np.asarray(stats["total_loss"])  # sync: isolate compile time
            print(f"[{label}] compile+step0: {time.time() - t_compile:.1f}s",
                  flush=True)
            t_loop = time.time()
        if (i + 1) % CHECK_EVERY == 0:
            pending.append((i + 1, {k2: stats[k2] for k2 in
                            ("metric_normal", "metric_vertical", "metric_size",
                             "metric_score", "gamma_mixture_filter_loss",
                             "gamma_engaged_frac", "total_loss")}))
    np.asarray(pending[-1][1]["total_loss"])  # drain the dispatch queue
    dt = (time.time() - t_loop) / (STEPS - 1)
    for s, d in pending:
        curve.append({"step": s, **{k2: float(v) for k2, v in d.items()}})
    print(f"[{label}] {dt * 1e3:.1f} ms/step", flush=True)
    return curve, dt


def main():
    import jax
    import jax.numpy as jnp
    from omni_pq_tpu.utils.compile_cache import enable as _ecc
    _ecc()
    from omni_pq_tpu.config import ModelConfig
    from omni_pq_tpu.data.synthetic import make_batch
    from omni_pq_tpu.models import PQTransformer

    print("backend:", jax.default_backend(), flush=True)
    cfg = ModelConfig()
    model = PQTransformer(cfg)
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):
        labeled = {k: jnp.asarray(v) for k, v in
                   make_batch(rng, 3, cfg.num_points).items()}
        weak = {k: jnp.asarray(v) for k, v in
                make_batch(rng, 3, cfg.num_points).items()}
        batches.append((labeled, weak))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batches[0][0]["point_clouds"])
    if PRETRAIN:
        print(f"supervised pretrain: {PRETRAIN} steps", flush=True)
        variables = pretrain(batches, model, cfg, variables, PRETRAIN)

    fixed_curve, fixed_dt = run({"use_fitted_mixture": False}, batches,
                                model, cfg, variables, "fixed")
    fitted_curve, fitted_dt = run({"use_fitted_mixture": True}, batches,
                                  model, cfg, variables, "fitted")

    out = {"steps": STEPS, "pretrain": PRETRAIN,
           "regime": "3+3 scenes/step, 40k pts, synthetic rooms, all losses",
           "fixed": {"ms_per_step": round(fixed_dt * 1e3, 1),
                     "curve": fixed_curve},
           "fitted": {"ms_per_step": round(fitted_dt * 1e3, 1),
                      "curve": fitted_curve}}
    os.makedirs("docs", exist_ok=True)
    suffix = f"_pre{PRETRAIN}" if PRETRAIN else ""
    with open(f"docs/fitted_mixture_curves{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        ("# Fitted vs fixed gamma-mixture criterion (full scale, real TPU)"
         + (f" — from a {PRETRAIN}-step supervised-pretrained state"
            if PRETRAIN else "")),
        "",
        "Command: `python scripts/fitted_mixture_tpu.py` (one v5e chip).",
        "",
        "The reference's EM fit never affects its keep-mask (fit.py:152-174 "
        "labels with the initial parameters — see losses/gamma.py). "
        "`--use_fitted_mixture` enables the paper-intent path: a 25-step "
        "on-device EM (lax.fori_loop, Newton on log(a)-digamma(a)) per scene "
        "per step. Both runs start from the same init on the same synthetic "
        "weak batches (3+3 scenes of 40k points, all losses on).",
        "",
        f"Measured cost of the on-device EM: "
        f"{fixed_dt * 1e3:.1f} ms/step (fixed) -> "
        f"{fitted_dt * 1e3:.1f} ms/step (fitted), "
        f"+{(fitted_dt - fixed_dt) * 1e3:.1f} ms "
        f"({(fitted_dt / fixed_dt - 1) * 100:.0f}%) — vs the reference's "
        "per-scene-per-step host scipy round trip.",
        "",
        "| step | criterion | engaged | m_normal | m_vertical | m_size | m_score | total loss |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, curve in (("fixed", fixed_curve), ("fitted", fitted_curve)):
        for c in curve:
            lines.append(
                f"| {c['step']} | {name} | "
                f"{c.get('gamma_engaged_frac', float('nan')):.2f} | "
                f"{c['metric_normal']:.4f} | "
                f"{c['metric_vertical']:.4f} | {c['metric_size']:.4f} | "
                f"{c['metric_score']:.4f} | {c['total_loss']:.3f} |")
    md = f"docs/FITTED_MIXTURE{suffix.upper()}.md" if suffix else \
        "docs/FITTED_MIXTURE.md"
    with open(md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {md}", flush=True)


if __name__ == "__main__":
    main()
