"""Prediction heads for object boxes and layout quads.

Rebuilds PredictHead / QuadPredictHead / decode_scores
(models/pq_transformer.py:35-121). Each head is two Dense+BN+ReLU layers
followed by parallel linear heads; predicted centers are offsets from the
(fixed per forward) cluster positions `base_xyz`.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .pointnet2 import BN_MOMENTUM, BN_EPS, acc_dtype


def _trunk(net, hidden_dim, train, dtype="float32"):
    acc = acc_dtype(dtype)
    net = nn.Dense(hidden_dim, dtype=dtype, name="conv1")(net)
    net = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                       epsilon=BN_EPS, dtype=acc, name="bn1")(net)
    net = nn.relu(net)
    net = nn.Dense(hidden_dim, dtype=dtype, name="conv2")(net)
    net = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                       epsilon=BN_EPS, dtype=acc, name="bn2")(net)
    return nn.relu(net)


class PredictHead(nn.Module):
    """Object box head: objectness(2), center offset, heading (1 bin),
    size (18 clusters + residuals), semantic class (18)."""
    hidden_dim: int
    num_heading_bin: int
    num_size_cluster: int
    num_class: int
    mean_size_arr: np.ndarray  # (num_size_cluster, 3)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, net, base_xyz, prefix: str, train: bool = False) -> Dict[str, jnp.ndarray]:
        """net (B,K,D), base_xyz (B,K,3) -> end_points update for `prefix`."""
        net = _trunk(net, self.hidden_dim, train, self.dtype)
        objectness = nn.Dense(2, name="objectness_scores_head")(net)
        center = nn.Dense(3, name="center_head")(net) + base_xyz
        heading_scores = nn.Dense(self.num_heading_bin, name="heading_class_head")(net)
        heading_res_norm = nn.Dense(self.num_heading_bin, name="heading_residual_head")(net)
        size_scores = nn.Dense(self.num_size_cluster, name="size_class_head")(net)
        size_res_norm = nn.Dense(self.num_size_cluster * 3, name="size_residual_head")(net)
        sem_cls_scores = nn.Dense(self.num_class, name="sem_cls_scores_head")(net)

        B, K = net.shape[0], net.shape[1]
        size_res_norm = size_res_norm.reshape(B, K, self.num_size_cluster, 3)
        mean_sizes = jnp.asarray(self.mean_size_arr)[None, None]  # (1,1,nc,3)
        size_residuals = size_res_norm * mean_sizes
        size_recover = size_residuals + mean_sizes
        pred_size_class = jnp.argmax(size_scores, axis=-1)  # (B,K)
        pred_size = jnp.take_along_axis(
            size_recover, pred_size_class[..., None, None].astype(jnp.int32),
            axis=2)[:, :, 0]  # (B,K,3)

        ep = {
            f"{prefix}objectness_scores": objectness,
            f"{prefix}center": center,
            f"{prefix}heading_scores": heading_scores,
            f"{prefix}heading_residuals_normalized": heading_res_norm,
            f"{prefix}heading_residuals": heading_res_norm * (np.pi / self.num_heading_bin),
            f"{prefix}size_scores": size_scores,
            f"{prefix}size_residuals_normalized": size_res_norm,
            f"{prefix}size_residuals": size_residuals,
            f"{prefix}pred_size": pred_size,
            f"{prefix}sem_cls_scores": sem_cls_scores,
        }
        return center, pred_size, ep


class QuadPredictHead(nn.Module):
    """Layout quad head: quadness(2), center offset, unit normal, 2D size.

    per_vector_norm=True normalizes each predicted normal to unit length; the
    reference divides by the global tensor norm (pq_transformer.py:112-113),
    see ModelConfig.quad_normal_per_vector_norm.
    """
    hidden_dim: int
    per_vector_norm: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, net, base_xyz, prefix: str, train: bool = False):
        net = _trunk(net, self.hidden_dim, train, self.dtype)
        quad_scores = nn.Dense(2, name="quad_scores_head")(net)
        center = nn.Dense(3, name="center_head")(net) + base_xyz
        normal = nn.Dense(3, name="normal_vector_head")(net)
        if self.per_vector_norm:
            normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-8)
        else:
            normal = normal / (jnp.linalg.norm(normal) + 1e-8)
        size = nn.Dense(2, name="size_head")(net)
        ep = {
            f"{prefix}quad_scores": quad_scores,
            f"{prefix}quad_center": center,
            f"{prefix}normal_vector": normal,
            f"{prefix}quad_size": size,
        }
        return center, size, ep
