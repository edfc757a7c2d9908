"""PQ-Transformer: the flagship model.

Rebuilds models/pq_transformer.py:123-267 as one flax module producing the
same `end_points` dict-of-arrays (a JAX pytree): backbone seeds -> FPS quad
queries + voted object queries -> initial proposal heads -> 6 decoder layers
over the 512 joint queries with per-layer object/quad heads. Prefix naming
matches the reference: 'proposal_', '0head_'..'4head_', 'last_'.

Iterative refinement stops gradients on the per-layer predicted centers used
as the next layer's query positions (pq_transformer.py:263-264).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig, SCANNET_MEAN_SIZES
from ..ops import fps, gather_points
from .backbone import Pointnet2Backbone
from .pointnet2 import SAModuleVotes
from .transformer import VotingModule, TransformerDecoderLayer
from .heads import PredictHead, QuadPredictHead


def decoder_prefixes(num_layers: int):
    return ["proposal_"] + [f"{i}head_" for i in range(num_layers - 1)] + ["last_"]


class PQTransformer(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, point_clouds: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        hd = cfg.hidden_dim
        dt = cfg.compute_dtype

        end_points = Pointnet2Backbone(
            input_feature_dim=cfg.input_feature_dim, width=cfg.backbone_width,
            depth=cfg.backbone_depth, out_dim=hd, dtype=dt,
            remat=cfg.remat_sa, fused=cfg.fused_sa,
            npoints=cfg.backbone_npoints,
            nsamples=cfg.backbone_nsamples, radii=cfg.backbone_radii,
            name="backbone")(point_clouds, train=train)
        seed_xyz = end_points["fp2_xyz"]
        seed_features = end_points["fp2_features"]

        # quad branch query init: plain FPS over seeds (pointnet_util.py:52-69)
        quad_inds = fps(seed_xyz, cfg.num_quad_proposal)
        quad_xyz = gather_points(seed_xyz, quad_inds)
        quad_feat = gather_points(seed_features, quad_inds)
        end_points["aggregated_sample_xyz"] = quad_xyz

        # object branch query init: voting + L2-normalized features + SA
        vote_xyz, vote_feat = VotingModule(hd, dtype=dt, name="vote")(
            seed_xyz, seed_features, train=train)
        vote_feat = vote_feat / (jnp.linalg.norm(vote_feat, axis=-1,
                                                 keepdims=True) + 1e-8)
        end_points["vote_xyz"] = vote_xyz
        end_points["vote_features"] = vote_feat
        cluster_xyz, cluster_feat, _ = SAModuleVotes(
            npoint=cfg.num_proposal, radius=0.3,
            nsample=cfg.vote_aggregation_nsample,
            mlp_channels=[hd, hd, hd], normalize_xyz=True, dtype=dt,
            remat=cfg.remat_sa, fused=cfg.fused_sa,
            name="vote_aggregation")(vote_xyz, vote_feat, train=train)
        end_points["aggregated_vote_xyz"] = cluster_xyz
        end_points["cluster_feature"] = cluster_feat

        # initial proposal heads
        obj_head_kw = dict(hidden_dim=hd, num_heading_bin=cfg.num_heading_bin,
                           num_size_cluster=cfg.num_size_cluster,
                           num_class=cfg.num_class,
                           mean_size_arr=SCANNET_MEAN_SIZES, dtype=dt)
        center, _, ep = PredictHead(**obj_head_kw, name="proposal_head")(
            cluster_feat, cluster_xyz, "proposal_", train=train)
        end_points.update(ep)
        center_q, _, ep = QuadPredictHead(
            hidden_dim=hd, per_vector_norm=cfg.quad_normal_per_vector_norm,
            dtype=dt,
            name="quad_proposal_head")(quad_feat, quad_xyz, "proposal_", train=train)
        end_points.update(ep)

        base_xyz = jax.lax.stop_gradient(center)
        base_xyz_q = jax.lax.stop_gradient(center_q)

        # joint decoder queries: [object 256 | quad 256] -> 512
        query = nn.Dense(hd, name="decoder_query_proj")(cluster_feat)
        query_q = nn.Dense(hd, name="quad_decoder_query_proj")(quad_feat)
        query_joint = jnp.concatenate([query, query_q], axis=1)
        key = nn.Dense(hd, name="decoder_key_proj")(seed_features)
        key_pos = seed_xyz

        prefixes = decoder_prefixes(cfg.num_decoder_layers)[1:]  # per-layer
        for i, prefix in enumerate(prefixes):
            query_pos_joint = jnp.concatenate([base_xyz, base_xyz_q], axis=1)
            query_joint = TransformerDecoderLayer(
                d_model=hd, nhead=cfg.nhead,
                dim_feedforward=cfg.dim_feedforward, dropout=cfg.dropout,
                dtype=dt,
                name=f"decoder_layer{i}")(
                query_joint, key, query_pos_joint, key_pos, train=train)
            q_obj = query_joint[:, :cfg.num_proposal]
            q_quad = query_joint[:, cfg.num_proposal:]

            center, _, ep = PredictHead(**obj_head_kw, name=f"prediction_head{i}")(
                q_obj, cluster_xyz, prefix, train=train)
            end_points.update(ep)
            center_q, _, ep = QuadPredictHead(
                hidden_dim=hd, per_vector_norm=cfg.quad_normal_per_vector_norm,
                dtype=dt,
                name=f"quad_prediction_head{i}")(q_quad, quad_xyz, prefix, train=train)
            end_points.update(ep)

            base_xyz = jax.lax.stop_gradient(center)
            base_xyz_q = jax.lax.stop_gradient(center_q)

        return end_points
