"""Capture + summarize an xprof trace of the full train step.

Writes a trace of a few steady-state steps, then prints the hlo_stats
top-N device-time table (offline, via xprof.convert — the tensorboard
plugin is broken against the installed TF; see .claude/skills/verify).

Run (TPU host):  python scripts/profile_step.py [--bf16] [--threefry] [--topn 40]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from omni_pq_tpu.utils.compile_cache import enable as _enable
_enable()

from omni_pq_tpu.config import ModelConfig, SCANNET_MEAN_SIZES
from omni_pq_tpu.data.synthetic import make_batch
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step)

BF16 = "--bf16" in sys.argv
REMAT = "--remat" in sys.argv
TOPN = int(sys.argv[sys.argv.index("--topn") + 1]) if "--topn" in sys.argv else 40
TRACE_DIR = "/tmp/omni_pq_trace"


def main():
    if "--offline" in sys.argv:  # re-parse the latest trace, no TPU run
        summarize()
        return
    print("backend:", jax.default_backend(), "bf16:", BF16,
          "remat:", REMAT, flush=True)
    cfg = ModelConfig(compute_dtype="bfloat16" if BF16 else "float32",
                      remat_sa=REMAT)
    model = PQTransformer(cfg)
    rng = np.random.default_rng(0)
    labeled = {k: jnp.asarray(v) for k, v in make_batch(rng, 3, cfg.num_points).items()}
    weak = {k: jnp.asarray(v) for k, v in make_batch(rng, 3, cfg.num_points).items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    labeled["point_clouds"])
    state = create_train_state(variables, OptimizerConfig(total_steps=1000))
    flags = TrainFlags(ema=True, gamma_mixture=True, arkit=False, pc_loss=True)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags, donate=True)

    key = (jax.random.PRNGKey(0) if "--threefry" in sys.argv
           else jax.random.key(0, impl="rbg"))
    t0 = time.time()
    for i in range(4):  # compile + warm
        key, k = jax.random.split(key)
        state, stats = step(state, labeled, weak, k, jnp.float32(0.05))
        np.asarray(stats["total_loss"])
    print(f"warm ({time.time() - t0:.0f}s); tracing...", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(3):
        key, k = jax.random.split(key)
        state, stats = step(state, labeled, weak, k, jnp.float32(0.05))
    np.asarray(stats["total_loss"])
    jax.profiler.stop_trace()
    summarize()


def summarize():
    import glob
    paths = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    path = paths[-1]
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "hlo_stats", {})
    import gzip
    import json
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    d = json.loads(data)
    if isinstance(d, dict) and "cols" in d:
        # Google DataTable format (xprof >= 2.x): {cols: [...], rows: [{c: [{v}]}]}
        labels = [c.get("label") or c.get("id") for c in d["cols"]]
        rows = [dict(zip(labels, (cell.get("v") if isinstance(cell, dict)
                                  else cell for cell in r["c"])))
                for r in d["rows"]]
    else:
        rows = d.get("data", d) if isinstance(d, dict) else d
    print(f"{len(rows)} hlo rows")
    kt = next((k for k in ("Total self time (us)", "total_time_us",
                           "Total time (us)") if k in rows[0]), None)
    cat_k = next((k for k in ("HLO op category", "hlo_category") if k in rows[0]), "?")
    nm_k = next((k for k in ("HLO op name", "hlo_op_name") if k in rows[0]), "?")
    fw_k = next((k for k in ("Framework op name", "framework_op_name")
                 if k in rows[0]), None)
    srt = sorted(rows, key=lambda r: -float(r.get(kt, 0) or 0))
    tot = sum(float(r.get(kt, 0) or 0) for r in rows)
    print(f"total {kt}: {tot:,.0f}")
    by_cat = {}
    for r in rows:
        by_cat[r.get(cat_k, "?")] = (by_cat.get(r.get(cat_k, "?"), 0)
                                     + float(r.get(kt, 0) or 0))
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  cat {t:12,.0f} us  {c}")
    for r in srt[:TOPN]:
        fw = (" | " + str(r.get(fw_k))[:60]) if fw_k else ""
        print(f"{float(r.get(kt, 0) or 0):12,.0f}  "
              f"{str(r.get(cat_k, '?')):20s} {str(r.get(nm_k, '?'))[:40]}{fw}")


if __name__ == "__main__":
    main()
