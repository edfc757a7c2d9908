"""Legacy EMA-teacher pseudo-GT quad losses (API-surface parity).

Rebuilds models/ema_loss_helper_pq.py:21-67 + loss_helper_pq.py:502-673:
teacher quad detections are rotated back into the student frame and used as
pseudo ground truth for the student's quad score / geometry losses. In the
reference this path is effectively dead — get_loss_mean_teacher combines it
with weight lambda_teacher = 0.0 (loss_helper_pq.py:663) — but it is part of
the public API surface, so it is reproduced (jnp, jittable) with the same
default weighting.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .supervised import get_loss, compute_quad_losses, prefixes_for


def _unrotate(xyz, flip_x, flip_y, rot_mat):
    """Rotate teacher-frame coordinates back to the student frame
    (loss_helper_pq.py:504-536: rotz(-angle) then flips)."""
    out = jnp.einsum("bkj,bij->bki", xyz, jnp.swapaxes(rot_mat, 1, 2))
    out = jnp.where(flip_y[:, None, None] > 0,
                    out * jnp.array([1.0, -1.0, 1.0]), out)
    out = jnp.where(flip_x[:, None, None] > 0,
                    out * jnp.array([-1.0, 1.0, 1.0]), out)
    return out


def get_loss_teacher(ep: Dict, ema_ep: Dict, num_layer: int = 6) -> jnp.ndarray:
    """Teacher-as-pseudo-GT quad loss (loss_helper_pq.py:502-647)."""
    flip_x, flip_y = ep["flip_x_axis"], ep["flip_y_axis"]
    rot_mat = ep["rot_mat"]

    pseudo_centers = _unrotate(ema_ep["last_quad_center"], flip_x, flip_y,
                               rot_mat)
    B, K2, _ = pseudo_centers.shape

    # rebuild normals through two in-plane tangents rotated back (:602-635)
    normal = ema_ep["last_normal_vector"]
    any_dir = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), normal.shape)
    v1 = jnp.cross(normal, any_dir)
    v1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + 1e-12)
    v2 = jnp.cross(normal, v1)
    v2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12)
    p1 = _unrotate(ema_ep["last_quad_center"] + v1, flip_x, flip_y, rot_mat)
    p2 = _unrotate(ema_ep["last_quad_center"] + v2, flip_x, flip_y, rot_mat)
    v1b = p1 - pseudo_centers
    v2b = p2 - pseudo_centers
    v1b = v1b / (jnp.linalg.norm(v1b, axis=-1, keepdims=True) + 1e-12)
    v2b = v2b / (jnp.linalg.norm(v2b, axis=-1, keepdims=True) + 1e-12)
    pseudo_normals = jnp.cross(v1b, v2b)
    pseudo_normals = pseudo_normals / (
        jnp.linalg.norm(pseudo_normals, axis=-1, keepdims=True) + 1e-12)

    sub = {
        "aggregated_sample_xyz": ep["aggregated_sample_xyz"],
        "gt_quad_centers": jax.lax.stop_gradient(pseudo_centers),
        "gt_quad_sizes": jax.lax.stop_gradient(ema_ep["last_quad_size"]),
        "gt_normal_vectors": jax.lax.stop_gradient(pseudo_normals),
        # all teacher proposals count as pseudo GT (:565-566)
        "num_gt_quads": jnp.full((B,), K2, jnp.int32),
    }
    for prefix in prefixes_for(num_layer):
        for k in ("quad_scores", "quad_center", "quad_size", "normal_vector"):
            sub[f"{prefix}{k}"] = ep[f"{prefix}{k}"]

    stats: Dict = {}
    score_sum, center_sum, vector_sum, size_sum = compute_quad_losses(
        sub, num_layer, stats)
    quad_loss_sum = center_sum + vector_sum + size_sum
    return quad_loss_sum + 2.5 * score_sum


def get_loss_mean_teacher(ep: Dict, ema_ep: Dict, mean_size_arr,
                          num_layer: int = 6, pc_loss: bool = False,
                          lambda_teacher: float = 0.0
                          ) -> Tuple[jnp.ndarray, Dict]:
    """loss_helper_pq.py:650-673: gt loss (gated on any use_gt) +
    lambda_teacher * teacher loss; lambda_teacher defaults to the reference's
    0.0."""
    gt_loss, stats = get_loss(ep, mean_size_arr, num_layer=num_layer,
                              pc_loss=pc_loss)
    teacher_loss = get_loss_teacher(ep, ema_ep, num_layer=num_layer)
    lambda_gt = jnp.any(ep["use_gt"]).astype(jnp.float32)
    loss = lambda_teacher * teacher_loss + lambda_gt * gt_loss
    stats["gt_loss"] = gt_loss
    stats["teacher_loss"] = teacher_loss
    stats["loss"] = loss
    return loss, stats
