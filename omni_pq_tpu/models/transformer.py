"""Voting module, learned position embedding, multi-head attention and the
DETR-style decoder layer.

Rebuilds models/voting_module.py:16-65, models/pq_transformer.py:17-33,
models/utils/multi_head_attention.py (used in its standard configuration —
callers pass attention_type='', transformer.py:146,212) and
models/transformer.py:162-228. Channel-last throughout; attention is a plain
einsum softmax attention (MXU-friendly), with dropout on the attention
weights like torch's MultiheadAttention.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2 import BN_MOMENTUM, BN_EPS, acc_dtype


class VotingModule(nn.Module):
    """VoteNet vote generation (voting_module.py). vote_factor=1, residual
    feature offsets."""
    seed_feature_dim: int = 288
    dtype: str = "float32"

    @nn.compact
    def __call__(self, seed_xyz, seed_features, train: bool = False):
        """seed_xyz (B,S,3), seed_features (B,S,C) -> vote_xyz, vote_features."""
        d = self.seed_feature_dim
        acc = acc_dtype(self.dtype)
        net = nn.Dense(d, dtype=self.dtype, name="conv1")(seed_features)
        net = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=acc, name="bn1")(net)
        net = nn.relu(net)
        net = nn.Dense(d, dtype=self.dtype, name="conv2")(net)
        net = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=acc, name="bn2")(net)
        net = nn.relu(net)
        net = nn.Dense(3 + d, dtype=self.dtype, name="conv3")(net)
        net = net.astype(acc)
        vote_xyz = seed_xyz + net[..., 0:3]
        vote_features = seed_features + net[..., 3:]
        return vote_xyz, vote_features


class PointsObjClsModule(nn.Module):
    """Per-seed objectness logits (models/utils/pointnet_util.py:330-356);
    part of the reference module surface (used by its kps sampling variant)."""
    seed_feature_dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, seed_features, train: bool = False):
        """(B, S, C) -> (B, S, 1) logits."""
        d = self.seed_feature_dim
        acc = acc_dtype(self.dtype)
        net = nn.Dense(d, dtype=self.dtype, name="conv1")(seed_features)
        net = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                   dtype=acc, name="bn1")(net))
        net = nn.Dense(d, dtype=self.dtype, name="conv2")(net)
        net = nn.relu(nn.BatchNorm(use_running_average=not train,
                                   momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                   dtype=acc, name="bn2")(net))
        return nn.Dense(1, name="conv3")(net)


def general_sampling(xyz, features, sample_inds):
    """GeneralSamplingModule (pointnet_util.py:361-375): gather xyz+features
    at given indices."""
    from ..ops import gather_points
    return (gather_points(xyz, sample_inds),
            gather_points(features, sample_inds), sample_inds)


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute position embedding over xyz
    (pq_transformer.py:17-33)."""
    num_pos_feats: int = 288

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        x = nn.Dense(self.num_pos_feats, name="conv1")(xyz)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, name="conv2")(x)


class MultiHeadAttention(nn.Module):
    """Standard MHA with packed qkv projections and attention-weight dropout,
    matching torch.nn.MultiheadAttention semantics (the reference's fork
    behaves identically for attention_type=''). Softmax runs in float32 even
    under bf16 compute.

    attention_type='self' reproduces the reference fork's one deviation
    (multi_head_attention.py:393-396): the output projection is applied to
    `query - attn_output` instead of `attn_output`. No reference driver
    reaches it (transformer.py:146,212 pass ''), but it is part of the
    reference's API surface."""
    d_model: int
    nhead: int
    dropout: float = 0.1
    dtype: str = "float32"
    attention_type: str = ""

    @nn.compact
    def __call__(self, q, k, v, train: bool = False):
        """q (B,Lq,D), k/v (B,Lk,D) -> (B,Lq,D)."""
        D, H = self.d_model, self.nhead
        hd = D // H
        qp = nn.Dense(D, dtype=self.dtype, name="q_proj")(q).reshape(*q.shape[:2], H, hd)
        kp = nn.Dense(D, dtype=self.dtype, name="k_proj")(k).reshape(*k.shape[:2], H, hd)
        vp = nn.Dense(D, dtype=self.dtype, name="v_proj")(v).reshape(*v.shape[:2], H, hd)
        acc = acc_dtype(self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                            preferred_element_type=acc) / jnp.sqrt(hd)
        weights = nn.softmax(logits.astype(acc), axis=-1)
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(vp.dtype), vp)
        out = out.astype(acc).reshape(*q.shape[:2], D)
        if self.attention_type == "self":
            out = q.astype(acc) - out
        return nn.Dense(D, name="out_proj")(out)


class TransformerDecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN with learned xyz position embeddings added
    to q/k/v every layer (transformer.py:162-228). Post-norm residuals."""
    d_model: int = 288
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: str = "float32"

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool = False):
        """query (B,Pq,D), key (B,Pk,D), query_pos (B,Pq,3), key_pos (B,Pk,3)."""
        drop = lambda name: nn.Dropout(self.dropout, deterministic=not train,
                                       name=name)
        q_embed = PositionEmbeddingLearned(self.d_model, name="self_posembed")(
            query_pos, train=train)
        k_embed = PositionEmbeddingLearned(self.d_model, name="cross_posembed")(
            key_pos, train=train)

        # torch nn.LayerNorm default eps is 1e-5 (the reference decoder uses
        # the default, transformer.py:173-175); flax's default is 1e-6.
        # Caught by float64 cross-execution: the eps mismatch put a
        # deterministic ~1e-6 step into every decoder layer's outputs.
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)

        qkv = query + q_embed
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype,
                                  name="self_attn")(qkv, qkv, qkv, train=train)
        query = ln("norm1")(query + drop("dropout1")(attn))

        kv = key + k_embed
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype,
                                  name="multihead_attn")(
            query + q_embed, kv, kv, train=train)
        query = ln("norm2")(query + drop("dropout2")(attn))

        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                      name="linear1")(query)
        ff = drop("dropout")(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        ff = ff.astype(acc_dtype(self.dtype))
        query = ln("norm3")(query + drop("dropout3")(ff))
        return query
