"""Loss primitives (models/utils/losses.py parity).

smoothl1_loss lives in ops/nn_distance.py; the focal loss here mirrors
SigmoidFocalClassificationLoss (models/utils/losses.py:21-81) — unused by the
reference's main path but part of its API surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nn_distance import smoothl1_loss, huber_loss  # noqa: F401 (re-export)


def sigmoid_focal_loss(prediction, target, weights, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Per-entry sigmoid focal loss: weights * alpha_t * (1-p_t)^gamma * CE.

    prediction/target (..., num_classes) logits / one-hot; weights
    broadcastable (the reference expands a (..., 1) weight)."""
    p = jax.nn.sigmoid(prediction)
    ce = (jax.nn.relu(prediction) - prediction * target
          + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
    p_t = target * p + (1.0 - target) * (1.0 - p)
    modulator = (1.0 - p_t) ** gamma if gamma else 1.0
    alpha_w = (target * alpha + (1.0 - target) * (1.0 - alpha)) if alpha is not None else 1.0
    return modulator * alpha_w * ce * weights
