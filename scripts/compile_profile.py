"""Cold-start compile-cost profile (VERDICT r2 weak #7).

Times jit lowering + compilation of the pieces of the training step at full
scale — forward-only, forward+backward supervised, the full semi-supervised
step — and checks whether the persistent compile cache actually hits across
process restarts (run this script twice; the second run should report cache
hits). Writes findings into benchmarks/TUNING.md by hand afterwards.

Run (TPU host):  python scripts/compile_profile.py [--no-cache]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if "--no-cache" not in sys.argv:
    from omni_pq_tpu.utils.compile_cache import enable as _enable
    _enable()

from omni_pq_tpu.config import ModelConfig, SCANNET_MEAN_SIZES
from omni_pq_tpu.data.synthetic import make_batch
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step)


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s", flush=True)
    return out, dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = ModelConfig()
    model = PQTransformer(cfg)
    rng = np.random.default_rng(0)
    labeled = {k: jnp.asarray(v) for k, v in
               make_batch(rng, 3, cfg.num_points).items()}
    weak = {k: jnp.asarray(v) for k, v in
            make_batch(rng, 3, cfg.num_points).items()}

    variables, t_init = timed(
        "model.init (jit, B=3)",
        lambda: jax.jit(model.init)(jax.random.PRNGKey(0),
                                    labeled["point_clouds"]))

    # forward only (eval path, B=6)
    pc6 = jnp.concatenate([labeled["point_clouds"], weak["point_clouds"]])
    fwd = jax.jit(lambda v, pc: model.apply(v, pc, train=False))
    lowered, t_lower = timed("forward lower", lambda: fwd.lower(variables, pc6))
    _, t_fwd = timed("forward compile (B=6)", lowered.compile)

    state = create_train_state(variables, OptimizerConfig(total_steps=1000))

    for name, flags in [
        ("sup-only step", TrainFlags(ema=False, gamma_mixture=False,
                                     arkit=False, pc_loss=True)),
        ("full semi-sup step", TrainFlags(ema=True, gamma_mixture=True,
                                          arkit=False, pc_loss=True)),
    ]:
        step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags,
                               donate=True)
        low, t_l = timed(
            f"{name} lower (trace)",
            lambda s=step: s.lower(state, labeled, weak,
                                   jax.random.PRNGKey(1), jnp.float32(0.05)))
        comp, t_c = timed(f"{name} compile", low.compile)
        txt = comp.as_text() if hasattr(comp, "as_text") else ""
        print(f"  {name}: HLO modules chars={len(txt)}", flush=True)

    # cache stats, if the jax version exposes them
    try:
        from jax._src import compilation_cache as cc
        print("cache dir:", jax.config.jax_compilation_cache_dir)
        d = jax.config.jax_compilation_cache_dir
        if d and os.path.isdir(d):
            n = sum(len(fs) for _, _, fs in os.walk(d))
            print(f"cache entries on disk: {n}")
        _ = cc  # silence linters
    except Exception as e:
        print("cache introspection unavailable:", e)


if __name__ == "__main__":
    main()
