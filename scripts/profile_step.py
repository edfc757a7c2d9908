"""Capture + summarize an xprof trace of the full train step.

Writes a trace of a few steady-state steps, then prints the hlo_stats
top-N device-time table (offline, via xprof.convert — the tensorboard
plugin is broken against the installed TF; see .claude/skills/verify).

Run (TPU host):  python scripts/profile_step.py [--bf16] [--topn 40]
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
TOPN = int(sys.argv[sys.argv.index("--topn") + 1]) if "--topn" in sys.argv else 40
TRACE_DIR = "/tmp/omni_pq_trace"


def main():
    print("backend:", jax.default_backend(), "bf16:", BF16, flush=True)
    cfg = ModelConfig(compute_dtype="bfloat16" if BF16 else "float32")
    model = PQTransformer(cfg)
    rng = np.random.default_rng(0)
    labeled = {k: jnp.asarray(v) for k, v in make_batch(rng, 3, cfg.num_points).items()}
    weak = {k: jnp.asarray(v) for k, v in make_batch(rng, 3, cfg.num_points).items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    labeled["point_clouds"])
    state = create_train_state(variables, OptimizerConfig(total_steps=1000))
    flags = TrainFlags(ema=True, gamma_mixture=True, arkit=False, pc_loss=True)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags, donate=True)

    key = jax.random.PRNGKey(0)
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
    rows = json.loads(data)
    # hlo_stats rows: list of dicts; device-time column name varies
    if isinstance(rows, dict):
        rows = rows.get("data", rows)
    print(f"{len(rows)} hlo rows")
    key_time = None
    sample = rows[1] if len(rows) > 1 else rows[0]
    for cand in ("total_time_us", "Total time (us)", "occurrences"):
        if cand in sample:
            key_time = cand
    print("columns:", list(sample.keys())[:14])
    kt = key_time or list(sample.keys())[0]
    srt = sorted((r for r in rows if isinstance(r, dict)),
                 key=lambda r: -float(r.get(kt, 0) or 0))
    tot = sum(float(r.get(kt, 0) or 0) for r in rows if isinstance(r, dict))
    print(f"total {kt}: {tot:,.0f}")
    for r in srt[:TOPN]:
        nm = (r.get("hlo_op_expression") or r.get("HLO Op expression")
              or r.get("hlo_op_name") or "?")
        cat = r.get("hlo_category") or r.get("HLO Category") or "?"
        print(f"{float(r.get(kt, 0) or 0):12,.0f}  {cat:24s} {str(nm)[:110]}")


if __name__ == "__main__":
    main()
