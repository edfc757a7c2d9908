"""ARKitScenes omni-supervised physical-constraint loss (pure jnp).

Rebuilds models/utils/arkit_loss_util.py:5-52: weak GT object boxes of the
unlabeled ARKit half supervise predicted quads — predicted normals are
flipped to point toward the pseudo scene center (0,0,1), then box corners
falling outside a confident quad's plane are penalized via the same
projection2d geometry as the supervised pc loss. The reference's per-scene /
per-quad Python loops become one masked (B, Q, P) computation.

DATA CONTRACT: the hardcoded pseudo center assumes scenes are roughly
ORIGIN-CENTERED — on an off-origin room, near-side wall normals flip
outward and perfect predictions are penalized (regression-tested in
tests/test_losses.py::test_pseudo_center_assumes_origin_centered_scenes;
root cause of the round-5 A/B arkit-arm collapse, docs/SEMI_SUP.md). The
reference satisfies it by re-centering labels on the scene's median xy at
load time (arkitscenes_dataset.py:102-121), as does data/arkitscenes.py.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .supervised import get_2d_box_corners

CONF_THRESH = 0.1


def get_arkit_pc_loss(ep: Dict, weak_labels: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ep: full double-batch end_points; weak_labels: the unlabeled half's
    {center_label (B,K2,3), size_label (B,K2,3), num_gt_boxes (B,)}.

    Only the second half of the batch (the weak scenes) is scored
    (arkit_loss_util.py:15-19)."""
    prefix = "last_"
    B = weak_labels["center_label"].shape[0]
    qc = ep[f"{prefix}quad_center"][B:]
    nv = ep[f"{prefix}normal_vector"][B:]
    qs = ep[f"{prefix}quad_size"][B:]
    scores = jax.nn.softmax(ep[f"{prefix}quad_scores"], axis=-1)[..., 1][B:]

    gt_center = weak_labels["center_label"]
    gt_size = weak_labels["size_label"]
    num_box = weak_labels["num_gt_boxes"].astype(jnp.float32)  # (B,)
    K2 = gt_center.shape[1]
    box_mask = (jnp.arange(K2)[None, :] < num_box[:, None]).astype(jnp.float32)

    corners = get_2d_box_corners(gt_size, gt_center)  # (B,K2,4,2)
    pts = corners.reshape(B, K2 * 4, 2)
    pts_mask = jnp.repeat(box_mask, 4, axis=1)

    # flip normals inward: toward pseudo scene center (0,0,1), z zeroed
    pseudo_center = jnp.array([0.0, 0.0, 1.0])
    offset = pseudo_center[None, None] - jax.lax.stop_gradient(qc)
    offset = offset.at[..., 2].set(0.0)
    reverse = jnp.sum(offset * nv, axis=-1, keepdims=True) < 0
    nv_in = jnp.where(reverse, -nv, nv)

    a, b = nv_in[..., 0], nv_in[..., 1]
    d = -(a * qc[..., 0] + b * qc[..., 1])
    px, py = pts[..., 0], pts[..., 1]
    delta = (a[:, :, None] * px[:, None, :] + b[:, :, None] * py[:, None, :]
             + d[:, :, None])  # (B,Q,P)
    k = -delta
    projx = px[:, None, :] + a[:, :, None] * k
    projy = py[:, None, :] + b[:, :, None] * k
    w = jnp.sqrt((projx - qc[..., 0:1]) ** 2 + (projy - qc[..., 1:2]) ** 2)
    point_mask = (w < qs[..., 0:1]).astype(jnp.float32)
    per_pt = jax.nn.relu(-delta) * point_mask * pts_mask[:, None, :]
    per_quad = jnp.sum(per_pt, axis=2)  # (B,Q)
    quad_mask = (scores > CONF_THRESH).astype(jnp.float32)
    scene_scale = jnp.where(num_box > 0, 1.0 / jnp.maximum(num_box, 1.0), 0.0)
    pc_loss = jnp.sum(per_quad * quad_mask * scene_scale[:, None])
    collisions = jnp.sum((per_pt > 1e-4).astype(jnp.float32)
                         * quad_mask[..., None]
                         * (num_box > 0)[:, None, None].astype(jnp.float32))
    return pc_loss, collisions
