"""Transplant a reference torch state_dict into the flax PQTransformer tree.

The reference publishes trained `.pth` checkpoints (README.md:103-116) whose
model payload is the state_dict of models/pq_transformer.py:123-194 (possibly
under DDP's 'module.' prefix, train.py:181-207). This module converts such a
state_dict into this repo's `{"params", "batch_stats"}` flax variables:

  torch Conv1d/Conv2d 1x1 weight (out, in, 1[,1])  -> Dense kernel (in, out)
  torch Linear weight (out, in)                    -> Dense kernel (in, out)
  torch MultiheadAttention in_proj_weight (3D, D)  -> q/k/v Dense kernels
  torch BatchNorm {weight, bias, running_mean/var} -> BN {scale, bias} params
                                                      + {mean, var} stats
  torch LayerNorm {weight, bias}                   -> LN {scale, bias}

Layer-name correspondences follow models/pq_transformer.py (proposal ->
proposal_head, decoder.{i} -> decoder_layer{i}, prediction_heads.{i} ->
prediction_head{i}, ...). The duplicate parameter paths torch emits for the
shared posembed modules (decoder_self_posembeds.{i}.* aliases
decoder.{i}.self_posembed.*) are consumed from the decoder.{i} path.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)


class _Builder:
    def __init__(self, sd: Dict):
        self.sd = sd
        self.params: Dict = {}
        self.stats: Dict = {}
        self.consumed = set()

    def _get(self, key):
        self.consumed.add(key)
        return _np(self.sd[key])

    def _set(self, tree, path, leaf):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def has(self, key):
        return key in self.sd

    def conv(self, dst, src, bias=None):
        """1x1 ConvNd -> Dense. bias=None: take bias iff present."""
        w = self._get(f"{src}.weight")
        k = w.reshape(w.shape[0], w.shape[1]).T  # (in, out)
        self._set(self.params, f"{dst}/kernel", k)
        if bias is None:
            bias = f"{src}.bias" in self.sd
        if bias:
            self._set(self.params, f"{dst}/bias", self._get(f"{src}.bias"))

    linear = conv  # Linear weight (out, in) reshapes identically

    def bn(self, dst, src):
        self._set(self.params, f"{dst}/scale", self._get(f"{src}.weight"))
        self._set(self.params, f"{dst}/bias", self._get(f"{src}.bias"))
        self._set(self.stats, f"{dst}/mean", self._get(f"{src}.running_mean"))
        self._set(self.stats, f"{dst}/var", self._get(f"{src}.running_var"))
        self.consumed.add(f"{src}.num_batches_tracked")

    def ln(self, dst, src):
        self._set(self.params, f"{dst}/scale", self._get(f"{src}.weight"))
        self._set(self.params, f"{dst}/bias", self._get(f"{src}.bias"))

    def mha(self, dst, src):
        """Packed in_proj -> split q/k/v Dense + out_proj."""
        w = self._get(f"{src}.in_proj_weight")  # (3D, D)
        b = self._get(f"{src}.in_proj_bias")
        d = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self._set(self.params, f"{dst}/{name}/kernel",
                      w[i * d:(i + 1) * d].T)
            self._set(self.params, f"{dst}/{name}/bias", b[i * d:(i + 1) * d])
        self.linear(f"{dst}/out_proj", f"{src}.out_proj", bias=True)

    def shared_mlp(self, dst, src):
        """pt_utils.SharedMLP (pytorch_utils.py:11-37): layer{i}.conv +
        layer{i}.bn.bn, conv bias absent when BN present."""
        i = 0
        while self.has(f"{src}.layer{i}.conv.weight"):
            self.conv(f"{dst}/layer{i}", f"{src}.layer{i}.conv")
            if self.has(f"{src}.layer{i}.bn.bn.weight"):
                self.bn(f"{dst}/bn{i}", f"{src}.layer{i}.bn.bn")
            i += 1
        if i == 0:
            raise KeyError(f"no SharedMLP layers under {src!r}")

    def posembed(self, dst, src):
        """PositionEmbeddingLearned (pq_transformer.py:17-33): Sequential
        [Conv1d, BN1d, ReLU, Conv1d] -> conv1 / bn / conv2."""
        self.conv(f"{dst}/conv1", f"{src}.position_embedding_head.0")
        self.bn(f"{dst}/bn", f"{src}.position_embedding_head.1")
        self.conv(f"{dst}/conv2", f"{src}.position_embedding_head.3")

    def predict_head(self, dst, src, quad: bool):
        for c in ("conv1", "conv2"):
            self.conv(f"{dst}/{c}", f"{src}.{c}")
        for b in ("bn1", "bn2"):
            self.bn(f"{dst}/{b}", f"{src}.{b}")
        heads = (("quad_scores_head", "center_head", "normal_vector_head",
                  "size_head") if quad else
                 ("objectness_scores_head", "center_head",
                  "heading_class_head", "heading_residual_head",
                  "size_class_head", "size_residual_head",
                  "sem_cls_scores_head"))
        for h in heads:
            self.conv(f"{dst}/{h}", f"{src}.{h}")


def strip_ddp_prefix(sd: Dict) -> Dict:
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def torch_state_dict_to_flax(sd: Dict, num_decoder_layers: int = 6,
                             like: Optional[Dict] = None) -> Dict:
    """state_dict (torch tensors or numpy arrays) -> {"params","batch_stats"}.

    like: optional flax variables pytree; when given, the result is checked
    to have exactly its structure and leaf shapes (raises on mismatch).
    """
    sd = strip_ddp_prefix(sd)
    b = _Builder(sd)

    for sa in ("sa1", "sa2", "sa3", "sa4"):
        b.shared_mlp(f"backbone/{sa}/mlp", f"backbone.{sa}.mlp_module")
    for fp in ("fp1", "fp2"):
        b.shared_mlp(f"backbone/{fp}/mlp", f"backbone.{fp}.mlp")

    for c in ("conv1", "conv2", "conv3"):
        b.conv(f"vote/{c}", f"vote.{c}")
    for bn in ("bn1", "bn2"):
        b.bn(f"vote/{bn}", f"vote.{bn}")
    b.shared_mlp("vote_aggregation/mlp", "vote_aggregation.mlp_module")

    b.predict_head("proposal_head", "proposal", quad=False)
    b.predict_head("quad_proposal_head", "quad_proposal", quad=True)

    for proj in ("decoder_query_proj", "quad_decoder_query_proj",
                 "decoder_key_proj"):
        b.conv(proj, proj)

    for i in range(num_decoder_layers):
        dl = f"decoder_layer{i}"
        b.posembed(f"{dl}/self_posembed", f"decoder.{i}.self_posembed")
        b.posembed(f"{dl}/cross_posembed", f"decoder.{i}.cross_posembed")
        b.mha(f"{dl}/self_attn", f"decoder.{i}.self_attn")
        b.mha(f"{dl}/multihead_attn", f"decoder.{i}.multihead_attn")
        b.linear(f"{dl}/linear1", f"decoder.{i}.linear1", bias=True)
        b.linear(f"{dl}/linear2", f"decoder.{i}.linear2", bias=True)
        for n in ("norm1", "norm2", "norm3"):
            b.ln(f"{dl}/{n}", f"decoder.{i}.{n}")
        b.predict_head(f"prediction_head{i}", f"prediction_heads.{i}",
                       quad=False)
        b.predict_head(f"quad_prediction_head{i}",
                       f"prediction_quad_heads.{i}", quad=True)
        # torch aliases of the shared posembed modules (registered both in
        # decoder.{i} and in the decoder_*_posembeds ModuleLists)
        for alias in (f"decoder_self_posembeds.{i}",
                      f"decoder_cross_posembeds.{i}"):
            b.consumed.update(k for k in sd if k.startswith(alias + "."))

    unused = sorted(set(sd) - b.consumed)
    if unused:
        raise KeyError(f"unmapped torch keys: {unused[:8]}"
                       f"{'...' if len(unused) > 8 else ''}")

    variables = {"params": b.params, "batch_stats": b.stats}
    if like is not None:
        import jax

        got = {"/".join(p): v.shape for p, v in
               _flatten(variables).items()}
        want = {"/".join(p): np.shape(v) for p, v in _flatten(like).items()}
        del jax
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        bad = sorted(k for k in set(got) & set(want)
                     if tuple(got[k]) != tuple(want[k]))
        if missing or extra or bad:
            raise ValueError(
                f"tree mismatch: missing={missing[:5]} extra={extra[:5]} "
                f"shape-mismatch={[(k, got[k], want[k]) for k in bad[:5]]}")
    return variables


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out
