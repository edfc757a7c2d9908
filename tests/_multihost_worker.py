"""Worker process for the 2-process multi-host test (not a pytest module).

Usage: python tests/_multihost_worker.py <proc_id> <num_procs> <port> <out>

Each process: jax.distributed.initialize on localhost, 2 virtual CPU devices
per process (4-device global 'data' mesh), shards a deterministic synthetic
dataset with the Loader's DistributedSampler-equivalent striding, feeds its
local slice via make_global_batch, and runs 2 full train steps. Writes the
replicated loss/grad-norm and a parameter checksum to <out>/proc<i>.json —
the test asserts both processes agree with each other and with a
single-process run over the same global batch."""
import json
import os
import sys


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

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

    cfg = ModelConfig(
        num_proposal=16, num_quad_proposal=16, num_decoder_layers=2,
        hidden_dim=32, nhead=4, dim_feedforward=64, backbone_width=1,
        backbone_npoints=(128, 64, 32, 16), backbone_nsamples=(8, 8, 8, 8),
        vote_aggregation_nsample=8, num_points=512)
    model = PQTransformer(cfg)
    mesh = make_mesh()

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


if __name__ == "__main__":
    main()
