"""Standalone evaluation driver (the reference eval.py:296-464).

Evaluates a checkpoint on the ScanNet val split (or ARKit valid with
--arkit, or synthetic rooms with --synthetic_data): quad F1 + object mAP.
Checkpoint tags mirror the reference: a path ending in 'ema_best' loads the
saved teacher into the student slot (eval.py:157-159).

Run:  python -m omni_pq_tpu.cli.eval --checkpoint_path log/x/ckpt_epoch_best \
          --data_root <scannet_root>
"""
from __future__ import annotations

import os
import sys

import numpy as np

from .args import parse_option
from .train import evaluate, get_datasets


def main(argv=None):
    args = parse_option(argv, is_eval=True)

    import jax
    import jax.numpy as jnp
    from ..utils.compile_cache import enable as _ecc
    _ecc()
    from ..config import DatasetConfig
    from ..data import Loader
    from ..models import PQTransformer
    from ..train import (OptimizerConfig, create_train_state, load_checkpoint)
    from ..utils.logger import setup_logger

    os.makedirs(args.log_dir, exist_ok=True)
    logger = setup_logger(args.log_dir)
    logger.info(" ".join(sys.argv))

    _, _, val_ds = get_datasets(args)
    val_loader = Loader(val_ds, min(args.batch_size, len(val_ds)),
                        shuffle=False, drop_last=False)

    from .train import make_model_config
    cfg = make_model_config(args)
    model = PQTransformer(cfg)
    sample = next(iter(val_loader))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(sample["point_clouds"]))
    state = create_train_state(variables, OptimizerConfig(total_steps=1))
    use_ema = False
    if args.checkpoint_path:
        state, _, tag = load_checkpoint(args.checkpoint_path, state)
        use_ema = tag == "ema_best"
        logger.info(f"loaded {args.checkpoint_path} (ema={use_ema})")

    from ..utils.metrics import MetricsLogger
    metrics = MetricsLogger(args.log_dir)
    f1 = evaluate(args, model, state, val_loader, DatasetConfig(), logger,
                  use_ema=use_ema, metrics=metrics)
    metrics.log(0, {"quad_f1": f1, "ema": float(use_ema)}, prefix="eval")
    metrics.close()
    print(f"F1: {f1:.4f}")
    return f1


if __name__ == "__main__":
    main()
