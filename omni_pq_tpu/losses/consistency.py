"""EMA mean-teacher consistency losses (pure jnp, jittable).

Rebuilds models/utils/mean_teacher_consistency_util.py: teacher predictions
are mapped back into the student's augmented frame (flip -> rotate -> scale,
:31-39), student and teacher proposal sets are Chamfer-matched, per-proposal
distances are confidence-weighted by the *student's* softmax scores indexed
exactly as the reference does (:45-47 — the weights come from the student's
end_points), and each distance tensor is clipped at its 85th percentile
(EMA_CLIP, :17) before averaging. Combination weights per prefix:
objects 0.5*center + 1.0*class + 0.05*size; quads 0.5*center + 0*class +
1.0*normal + 0.05*size; averaged over all 7 prefixes (:201-270).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.nn_distance import nn_distance

EMA_CLIP = 0.85


def _align_ema_centers(ema_center, flip_x, flip_y, rot_mat, scale):
    """Map teacher centers into the student frame (:31-39)."""
    x = jnp.where(flip_x[:, None, None] > 0,
                  ema_center * jnp.array([-1.0, 1.0, 1.0]), ema_center)
    x = jnp.where(flip_y[:, None, None] > 0,
                  x * jnp.array([1.0, -1.0, 1.0]), x)
    x = jnp.einsum("bkj,bij->bki", x, rot_mat)  # x @ rot_mat^T
    return x * scale[:, None, None]


def _quantile_clip_mean(dist):
    """mean of dist * (dist < 85th percentile of the whole tensor)."""
    eps = jnp.quantile(dist, EMA_CLIP)
    return jnp.mean(jnp.where(dist < eps, dist, 0.0))


def _center_consistency(center, ema_center_aligned, scores):
    """Confidence-weighted bidirectional Chamfer with quantile clipping.

    Returns (loss, map_ind (B,K) teacher->student assignment, dist2_mask)."""
    dist1, ind1, dist2, ind2 = nn_distance(center, ema_center_aligned)
    # student scores indexed by the matched teacher index — reproduced from
    # mean_teacher_consistency_util.py:45-47
    dist1_mask = jnp.take_along_axis(scores, ind1, axis=1)
    dist2_mask = scores
    dist = dist1 * dist1_mask + dist2 * dist2_mask
    return _quantile_clip_mean(dist), ind2, dist2_mask


def _class_consistency(cls_scores, ema_cls_scores, map_ind, batchmean=False):
    """KL(student aligned || teacher), x2 (:99-111)."""
    logp = jax.nn.log_softmax(cls_scores, axis=2)
    ema_p = jax.nn.softmax(ema_cls_scores, axis=2)
    logp_aligned = jnp.take_along_axis(logp, map_ind[..., None], axis=1)
    kl = ema_p * (jnp.log(jnp.clip(ema_p, 1e-12)) - logp_aligned)
    if batchmean:
        return 2.0 * jnp.sum(kl) / cls_scores.shape[0]
    return 2.0 * jnp.mean(kl)


def _decode_size(size_scores, size_residuals, mean_size_arr):
    cls = jnp.argmax(size_scores, -1)
    # one-hot select instead of the per-row gather (the TPU gather floor is
    # ~11.5 ns/row; see losses/supervised.py:select_last_dim)
    oh = cls[..., None] == jnp.arange(size_residuals.shape[2],
                                      dtype=jnp.int32)
    res = jnp.sum(jnp.where(oh[..., None], size_residuals, 0.0), axis=2)
    return jnp.asarray(mean_size_arr)[cls] + res


def _size_consistency(size, ema_size, map_ind, confidence):
    aligned = jnp.take_along_axis(size, map_ind[..., None], axis=1)
    dist = jnp.sum((aligned - ema_size) ** 2, axis=2) * confidence
    return _quantile_clip_mean(dist)


def _normal_consistency(normal, ema_normal, map_ind, confidence):
    aligned = jnp.take_along_axis(normal, map_ind[..., None], axis=1)
    cos = jnp.sum(aligned[..., :2] * ema_normal[..., :2], -1) / (
        jnp.linalg.norm(aligned[..., :2], axis=-1)
        * jnp.linalg.norm(ema_normal[..., :2], axis=-1) + 1e-8)
    dist = (1.0 - jnp.abs(cos)) * confidence
    return _quantile_clip_mean(dist)


def get_consistency_loss(ep: Dict, ema_ep: Dict, mean_size_arr,
                         num_layer: int = 6) -> Tuple[jnp.ndarray, Dict]:
    """Total consistency loss over all prefixes (:201-270).

    `ep` must carry augmentation records flip_x_axis, flip_y_axis (B,),
    rot_mat (B,3,3), scale (B,).
    """
    flip_x, flip_y = ep["flip_x_axis"], ep["flip_y_axis"]
    rot_mat, scale = ep["rot_mat"], ep["scale"]
    prefixes = ["last_", "proposal_"] + [f"{i}head_" for i in range(num_layer - 1)]

    stats: Dict = {}
    obj_sum, quad_sum = 0.0, 0.0
    obj_center_s, obj_class_s, obj_size_s = 0.0, 0.0, 0.0
    q_center_s, q_class_s, q_normal_s, q_size_s = 0.0, 0.0, 0.0, 0.0
    for prefix in prefixes:
        # objects
        ema_center = _align_ema_centers(ema_ep[f"{prefix}center"], flip_x,
                                        flip_y, rot_mat, scale)
        scores = jax.nn.softmax(ep[f"{prefix}objectness_scores"], axis=2)[..., 1]
        center_c, map_ind, conf = _center_consistency(
            ep[f"{prefix}center"], ema_center, scores)
        class_c = _class_consistency(ep[f"{prefix}sem_cls_scores"],
                                     ema_ep[f"{prefix}sem_cls_scores"], map_ind)
        size = _decode_size(ep[f"{prefix}size_scores"],
                            ep[f"{prefix}size_residuals"], mean_size_arr)
        ema_size = _decode_size(ema_ep[f"{prefix}size_scores"],
                                ema_ep[f"{prefix}size_residuals"], mean_size_arr)
        ema_size = ema_size * scale[:, None, None]
        size_c = _size_consistency(size, ema_size, map_ind, conf)
        obj_c = 0.5 * center_c + 1.0 * class_c + 0.05 * size_c
        obj_center_s += center_c
        obj_class_s += class_c
        obj_size_s += size_c
        obj_sum = obj_sum + obj_c

        # quads
        ema_qcenter = _align_ema_centers(ema_ep[f"{prefix}quad_center"], flip_x,
                                         flip_y, rot_mat, scale)
        qscores = jax.nn.softmax(ep[f"{prefix}quad_scores"], axis=2)[..., 1]
        qcenter_c, qmap_ind, qconf = _center_consistency(
            ep[f"{prefix}quad_center"], ema_qcenter, qscores)
        qclass_c = _class_consistency(ep[f"{prefix}quad_scores"],
                                      ema_ep[f"{prefix}quad_scores"], qmap_ind,
                                      batchmean=True)
        qnormal_c = _normal_consistency(ep[f"{prefix}normal_vector"],
                                        ema_ep[f"{prefix}normal_vector"],
                                        qmap_ind, qconf)
        qsize_c = _size_consistency(ep[f"{prefix}quad_size"],
                                    ema_ep[f"{prefix}quad_size"], qmap_ind, qconf)
        quad_c = 0.5 * qcenter_c + 0.0 * qclass_c + 1.0 * qnormal_c + 0.05 * qsize_c
        q_center_s += qcenter_c
        q_class_s += qclass_c
        q_normal_s += qnormal_c
        q_size_s += qsize_c
        quad_sum = quad_sum + quad_c

    n = float(len(prefixes))
    stats["center_consistency_loss"] = obj_center_s / n
    stats["class_consistency_loss"] = obj_class_s / n
    stats["size_consistency_loss"] = obj_size_s / n
    stats["consistency_loss"] = obj_sum / n
    stats["quad_center_consistency_loss_sum"] = q_center_s / n
    stats["quad_class_consistency_loss_sum"] = q_class_s / n
    stats["quad_normal_consistency_loss_sum"] = q_normal_s / n
    stats["quad_size_consistency_loss_sum"] = q_size_s / n
    stats["quad_consistency_loss_sum"] = quad_sum / n
    return obj_sum / n + quad_sum / n, stats
