"""Worker process for the 2-process multi-host tests (not a pytest module).

Usage: python tests/_multihost_worker.py <proc_id> <num_procs> <port> <out>
       [mode]

Each process: jax.distributed.initialize on localhost, 2 virtual CPU devices
per process (4-device global 'data' mesh).

mode "train" (default): shards a deterministic synthetic dataset with the
Loader's DistributedSampler-equivalent striding, feeds its local slice via
make_global_batch, and runs 2 full train steps. Writes the replicated
loss/grad-norm and a parameter checksum to <out>/proc<i>.json — the test
asserts both processes agree with each other and with a single-process run
over the same global batch.

mode "eval": runs cli.train.evaluate over a sharded val loader whose LAST
local batch does not fill the local device count (6 scenes, 2 shards, local
bs 2 -> batches of 2 then 1), exercising the pad / allgather / _trim branch
(cli/train.py multiproc eval; reference equivalent train.py:609-768). Writes
the full-set quad F1 — the test asserts it equals a single-process run."""
import json
import os
import sys


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"

    # force exactly 2 virtual devices per process (override any inherited
    # pytest XLA_FLAGS, which use 8)
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from omni_pq_tpu.config import ModelConfig, SCANNET_MEAN_SIZES
    from omni_pq_tpu.data.loader import Loader
    from omni_pq_tpu.data.synthetic import SyntheticDataset
    from omni_pq_tpu.models import PQTransformer
    from omni_pq_tpu.parallel import make_mesh, make_global_batch, replicate
    from omni_pq_tpu.train import (TrainFlags, OptimizerConfig,
                                   create_train_state, make_train_step)

    from tests.util import TINY as cfg
    model = PQTransformer(cfg)
    mesh = make_mesh()

    if mode == "eval":
        run_eval(proc_id, nproc, outdir, cfg, model, mesh)
        jax.distributed.shutdown()
        return

    ds = SyntheticDataset(8, cfg.num_points, seed=0, num_objects=3)
    loader = Loader(ds, batch_size=4 // nproc, shuffle=False,
                    shard_id=proc_id, num_shards=nproc)
    local = next(iter(loader))
    batch = make_global_batch(local, mesh)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch["point_clouds"])
    state = create_train_state(variables, OptimizerConfig(total_steps=10))
    state = replicate(state, mesh)
    flags_ = TrainFlags(ema=True, gamma_mixture=True, arkit=False,
                        pc_loss=True)
    step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags_)
    out = {}
    for i in range(2):
        state, stats = step(state, batch, batch, jax.random.PRNGKey(7 + i),
                            jnp.float32(0.05))
        out[f"loss{i}"] = float(stats["total_loss"])
        out[f"grad_norm{i}"] = float(stats["grad_norm"])
    out["param_sum"] = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree_util.tree_leaves(state.params)))
    with open(os.path.join(outdir, f"proc{proc_id}.json"), "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


def run_eval(proc_id, nproc, outdir, cfg, model, mesh):
    """Sharded-eval agreement: full-set F1 from the multiproc path."""
    import argparse
    import logging

    import numpy as np
    import jax
    from omni_pq_tpu.cli.train import evaluate
    from omni_pq_tpu.config import DatasetConfig
    from omni_pq_tpu.data.loader import Loader
    from omni_pq_tpu.data.synthetic import SyntheticDataset
    from omni_pq_tpu.parallel import replicate
    from omni_pq_tpu.train import OptimizerConfig, create_train_state

    ds = SyntheticDataset(6, cfg.num_points, seed=3, num_objects=3)
    # 3 scenes per shard at local bs 2 -> second local batch has 1 scene,
    # below the 2 local devices: exercises pad + _trim
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    shard_id=proc_id, num_shards=nproc)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.zeros((2, cfg.num_points, 3), jax.numpy.float32))
    state = replicate(create_train_state(variables,
                                         OptimizerConfig(total_steps=10)),
                      mesh)
    args = argparse.Namespace(ap_iou_thresholds=[0.25], faster_eval=False,
                              nms_iou_quad=0.25, dump_result=False,
                              log_dir=outdir)
    f1 = evaluate(args, model, state, loader, DatasetConfig(),
                  logging.getLogger("eval"), mesh=mesh)
    param_sum = float(sum(np.abs(np.asarray(x)).sum()
                          for x in jax.tree_util.tree_leaves(state.params)))
    with open(os.path.join(outdir, f"eval{proc_id}.json"), "w") as f:
        json.dump({"f1": f1, "param_sum": param_sum}, f)


if __name__ == "__main__":
    main()
