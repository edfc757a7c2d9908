"""Checkpointing: orbax pytree checkpoints with the reference's contents and
policies (train.py:153-207: {model, ema_model, optimizer, scheduler, epoch};
best / ema_best / periodic / last naming; resume backfills a missing teacher
from student weights)."""
from __future__ import annotations

import os
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


# Checkpoint kind is stored explicitly in the payload (an int code, since
# orbax pytree checkpoints hold arrays) instead of being sniffed from the
# path suffix.
_TAG_CODES = {"": 0, "best": 1, "ema_best": 2, "last": 3}
_CODE_TAGS = {v: k for k, v in _TAG_CODES.items()}


def save_checkpoint(log_dir: str, tag, state: TrainState, epoch: int):
    """tag: epoch number or 'best'/'ema_best'/'last'."""
    path = os.path.abspath(os.path.join(log_dir, f"ckpt_epoch_{tag}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(epoch),
        "tag_code": np.asarray(_TAG_CODES.get(str(tag), 0)),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state: TrainState):
    """Restores into an existing state skeleton; returns (state, epoch, tag)
    where tag is '' (periodic epoch checkpoint), 'best', 'ema_best' or
    'last'. Epoch sentinels like the reference: 'last' -> epoch 600,
    'best'/'ema_best' -> 0 (train.py:157-160)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    skeleton = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": np.asarray(0),
        "tag_code": np.asarray(0),
    }
    restored = ckptr.restore(path, skeleton)
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        ema_params=restored["ema_params"],
        ema_batch_stats=restored["ema_batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
    epoch = int(restored["epoch"])
    tag = _CODE_TAGS[int(restored["tag_code"])]
    if tag == "last":
        epoch = 600
    elif tag in ("best", "ema_best"):
        epoch = 0
    return state, epoch, tag
