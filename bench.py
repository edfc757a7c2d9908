"""Benchmark: ScanNet-regime semi-supervised training throughput on one chip.

Measures the full student+teacher double-batch train step (supervised +
physical-constraint + EMA consistency + on-device gamma-mixture losses,
backward, clipped AdamW update, EMA update) at the reference's training
regime: batch 3 labeled + 3 weak scenes of 40k points (train.sh:12-31)
=> scenes/sec/chip counts 6 scenes per step.

Baseline (vs_baseline denominator): the reference publishes no throughput
(BASELINE.md); 4.0 scenes/sec/chip is our documented estimate of the A100
reference implementation (which runs with torch anomaly detection always on
(train.py:26) and a per-scene-per-step host scipy EM fit
(gamma_mixture_loss_util.py:63-69)). The north-star is >=2x that, i.e.
vs_baseline >= 2.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 4.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from omni_pq_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    from omni_pq_tpu.config import ModelConfig, SCANNET_MEAN_SIZES
    from omni_pq_tpu.data.synthetic import make_batch
    from omni_pq_tpu.models import PQTransformer
    from omni_pq_tpu.train import (TrainFlags, OptimizerConfig,
                                   create_train_state, make_train_step)

    log("backend:", jax.default_backend(), jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    # bfloat16 Dense/MXU compute is the training default (the CLI's too):
    # convergence evidence in docs/CONVERGENCE_bf16.md. Overrides (measured
    # in benchmarks/TUNING.md):
    #   OMNI_PQ_F32=1   -> full float32 compute (the --f32 CLI mode)
    #   OMNI_PQ_REMAT=1 -> remat the SA-layer MLPs (bytes-for-FLOPs trade)
    import os
    #   OMNI_PQ_FUSE=1  -> fused SA-MLP Pallas kernel for the STUDENT
    #                      fwd+bwd too (measured slower: the backward remat
    #                      re-pays the forward's byte savings, TUNING.md)
    cfg = ModelConfig(
        compute_dtype=("float32" if os.environ.get("OMNI_PQ_F32") == "1"
                       else "bfloat16"),
        remat_sa=os.environ.get("OMNI_PQ_REMAT") == "1",
        fused_sa=os.environ.get("OMNI_PQ_FUSE") == "1")
    log("compute_dtype:", cfg.compute_dtype, "remat_sa:", cfg.remat_sa,
        "fused_sa:", cfg.fused_sa)
    B = 3  # labeled scenes (reference train.sh batch_size)
    N = cfg.num_points
    model = PQTransformer(cfg)

    rng = np.random.default_rng(0)
    t0 = time.time()
    batches = []
    for i in range(3):  # a few distinct batches to defeat any caching
        labeled = {k: jnp.asarray(v) for k, v in make_batch(rng, B, N).items()}
        weak = {k: jnp.asarray(v) for k, v in make_batch(rng, B, N).items()}
        batches.append((labeled, weak))
    log("data gen: %.1fs" % (time.time() - t0))

    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batches[0][0]["point_clouds"])
    jax.block_until_ready(variables)
    log("init: %.1fs" % (time.time() - t0))

    state = create_train_state(variables, OptimizerConfig(total_steps=10000))
    flags = TrainFlags(ema=True, gamma_mixture=True, arkit=False, pc_loss=True)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags, donate=True)

    # TPU-native hardware PRNG for the in-step randomness (dropout masks,
    # gamma EM sampling) — the CLI default too. Fused threefry mask
    # generation measured 23.3 ms of the 133.7 ms step (TUNING.md).
    # OMNI_PQ_THREEFRY=1 restores the counter-based stream.
    if os.environ.get("OMNI_PQ_THREEFRY") == "1":
        key = jax.random.PRNGKey(0)
    else:
        key = jax.random.key(0, impl="rbg")
    t0 = time.time()
    key, k = jax.random.split(key)
    state, stats = step(state, batches[0][0], batches[0][1], k,
                        jnp.float32(0.05))
    _ = np.asarray(stats["total_loss"])  # force full sync (block_until_ready
    # does not actually block under the axon tunnel)
    log("first step (compile): %.1fs, loss=%.3f" % (
        time.time() - t0, float(stats["total_loss"])))

    # warmup
    for i in range(2):
        key, k = jax.random.split(key)
        state, stats = step(state, batches[i % 3][0], batches[i % 3][1], k,
                            jnp.float32(0.05))
        _ = np.asarray(stats["total_loss"])

    # Steps chain through `state`, so issuing a block back-to-back and
    # fetching one scalar at the end measures true step latency — like a real
    # training loop, which only syncs at print_freq. A per-step fetch would
    # add the ~32ms fixed dispatch+fetch round trip of this TPU transport to
    # every step.
    iters = 20 if on_tpu else 2
    best = float("inf")
    for rep in range(3 if on_tpu else 1):
        t0 = time.time()
        for i in range(iters):
            key, k = jax.random.split(key)
            state, stats = step(state, batches[i % 3][0], batches[i % 3][1],
                                k, jnp.float32(0.05))
        _ = np.asarray(stats["total_loss"])
        best = min(best, (time.time() - t0) / iters)
    dt = best
    scenes_per_sec = 2 * B / dt
    log("steady state: %.1f ms/step -> %.2f scenes/s" % (dt * 1e3,
                                                         scenes_per_sec))

    print(json.dumps({
        "metric": "ScanNet scenes/sec/chip (student+teacher step)",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "baseline_note": ("denominator 4.0 scenes/s/chip is an ESTIMATE of "
                          "the A100 reference (it publishes no throughput); "
                          "north star is vs_baseline >= 2"),
    }))


if __name__ == "__main__":
    main()
