#!/usr/bin/env python
"""Import a reference torch checkpoint (.pth) into this repo's format.

The reference publishes trained checkpoints and an F1 table
(/root/reference/README.md:103-116); its save format is a single torch file
{model, ema_model, optimizer, scheduler, epoch} with state_dict keys possibly
under DDP's 'module.' prefix (/root/reference/train.py:181-207). This script
transplants the model (and ema_model, when present) weights into the flax
PQTransformer tree (interop/import_weights.py) and writes an orbax checkpoint
that cli/train.py --checkpoint_path and cli/eval.py can load directly.

Usage:
  python scripts/import_torch_weights.py ckpt_epoch_best.pth out_dir/
  # then: python -m omni_pq_tpu.cli.eval --checkpoint_path out_dir/ckpt_epoch_last

Optimizer/scheduler state is NOT transplanted (torch AdamW moments are not
meaningful to optax without exact step alignment); resuming training from an
imported checkpoint restarts the optimizer, like the reference's own
ema-backfill path does for the teacher (train.py:167-173).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="reference torch checkpoint (.pth)")
    ap.add_argument("out_dir", help="directory to write the orbax checkpoint")
    ap.add_argument("--tag", default="last",
                    help="checkpoint tag (best/ema_best/last/<epoch>)")
    args = ap.parse_args()

    import torch
    import jax
    import jax.numpy as jnp

    from omni_pq_tpu.train import (OptimizerConfig, create_train_state)
    from omni_pq_tpu.train.checkpoint import save_checkpoint
    from omni_pq_tpu.interop.import_weights import torch_state_dict_to_flax

    payload = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = payload["model"] if "model" in payload else payload
    variables = torch_state_dict_to_flax(sd)
    variables = jax.tree.map(jnp.asarray, variables)
    state = create_train_state(variables, OptimizerConfig(), ema=True)

    if isinstance(payload, dict) and payload.get("ema_model"):
        ema = torch_state_dict_to_flax(payload["ema_model"])
        state = state.replace(
            ema_params=jax.tree.map(jnp.asarray, ema["params"]),
            ema_batch_stats=jax.tree.map(jnp.asarray, ema["batch_stats"]))

    epoch = payload.get("epoch", 0) if isinstance(payload, dict) else 0
    if not isinstance(epoch, int):
        epoch = 0
    os.makedirs(args.out_dir, exist_ok=True)
    path = save_checkpoint(args.out_dir, args.tag, state, epoch)
    print(f"wrote {path} (epoch {epoch})")


if __name__ == "__main__":
    main()
