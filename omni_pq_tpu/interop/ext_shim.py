"""CPU stand-in for the reference's CUDA `pointnet2._ext` extension.

The reference network (models/pq_transformer.py:123-267) cannot run without a
GPU because every `_ext` op aborts on CPU (e.g. ball_query.cpp:36-37). This
module registers a fake `pointnet2._ext` in sys.modules whose 9 ops
(bindings.cpp:11-24) are backed by this repo's own jnp kernel oracles
(ops/reference.py) and plain torch gathers — so the reference model runs on
CPU, and so FPS / ball-query / 3-NN index decisions are computed by the SAME
code on the torch side and the flax side of a parity test (bitwise-identical
indices on identical xyz inputs).

`load_reference_pq_transformer()` then imports the untouched reference source
from /root/reference and instantiates PQ_Transformer the way train.py:324-343
does, with `.cuda()` neutralized (decode_scores calls it on a constant,
models/pq_transformer.py:47).
"""
from __future__ import annotations

import functools
import os
import sys
import types

import numpy as np

REFERENCE_ROOT = os.environ.get("OMNI_PQ_REFERENCE", "/root/reference")


# ---------------------------------------------------------------- shim ops
@functools.lru_cache(maxsize=None)
def _jitted_oracles():
    import jax
    from ..ops.reference import three_nn_ref
    # the very same jitted callables the flax model uses under
    # oracle_model_ops(): identical compiled graphs -> identical index bits
    from .oracle_ops import fps_oracle, ball_query_group_oracle

    return {
        "fps": fps_oracle,
        "ball_query": (lambda radius, nsample, xyz, new_xyz:
                       ball_query_group_oracle(radius, nsample, xyz,
                                               new_xyz)[0]),
        "three_nn": jax.jit(three_nn_ref),
    }


def _make_ext_module():
    import torch

    ops = _jitted_oracles()
    mod = types.ModuleType("pointnet2._ext")

    def furthest_point_sampling(xyz, npoint):
        # sampling_gpu.cu:74-234 semantics via ops/reference.py:fps_ref
        out = np.asarray(ops["fps"](xyz.detach().cpu().numpy(), int(npoint)))
        return torch.from_numpy(out.astype(np.int32))

    def ball_query(new_xyz, xyz, radius, nsample):
        # ball_query_gpu.cu:14-49 semantics via ball_query_ref
        out = np.asarray(ops["ball_query"](
            float(radius), int(nsample), xyz.detach().cpu().numpy(),
            new_xyz.detach().cpu().numpy()))
        return torch.from_numpy(out.astype(np.int32))

    def three_nn(unknown, known):
        d2, idx = ops["three_nn"](unknown.detach().cpu().numpy(),
                                  known.detach().cpu().numpy())
        return (torch.from_numpy(np.array(d2)),
                torch.from_numpy(np.array(idx, dtype=np.int32)))

    def gather_points(points, idx):
        # sampling_gpu.cu:13-35: out[b,c,j] = points[b,c,idx[b,j]]
        B, C, _ = points.shape
        ix = idx.long().unsqueeze(1).expand(B, C, idx.shape[1])
        return torch.gather(points, 2, ix).contiguous()

    def group_points(points, idx):
        # group_points_gpu.cu:13-43: out[b,c,j,k] = points[b,c,idx[b,j,k]]
        # .clone(): reshape-of-gather is a VIEW, and the reference's
        # QueryAndGroup modifies the custom Function's output in place
        # (pointnet2_utils.py:350), which autograd forbids on view outputs
        B, C, _ = points.shape
        _, S, K = idx.shape
        ix = idx.long().reshape(B, 1, S * K).expand(B, C, S * K)
        return torch.gather(points, 2, ix).reshape(B, C, S, K).clone()

    def three_interpolate(points, idx, weight):
        # interpolate_gpu.cu:77-117: out[b,c,j] = sum_i w_i * points[b,c,idx_i]
        B, C, _ = points.shape
        n = idx.shape[1]
        ix = idx.long().reshape(B, 1, n * 3).expand(B, C, n * 3)
        g = torch.gather(points, 2, ix).reshape(B, C, n, 3)
        return (g * weight.unsqueeze(1)).sum(-1).contiguous()

    def gather_points_grad(grad_out, idx, n):
        # sampling_gpu.cu:37-62: scatter-add grad rows back to the points
        B, C, S = grad_out.shape
        ix = idx.long().unsqueeze(1).expand(B, C, S)
        out = torch.zeros((B, C, n), dtype=grad_out.dtype)
        return out.scatter_add_(2, ix, grad_out.contiguous())

    def group_points_grad(grad_out, idx, n):
        # group_points_gpu.cu:45-80
        B, C, S, K = grad_out.shape
        ix = idx.long().reshape(B, 1, S * K).expand(B, C, S * K)
        out = torch.zeros((B, C, n), dtype=grad_out.dtype)
        return out.scatter_add_(2, ix, grad_out.reshape(B, C, S * K))

    def three_interpolate_grad(grad_out, idx, weight, m):
        # interpolate_gpu.cu:119-159
        B, C, n = grad_out.shape
        ix = idx.long().reshape(B, 1, n * 3).expand(B, C, n * 3)
        contrib = (grad_out.unsqueeze(-1)
                   * weight.unsqueeze(1)).reshape(B, C, n * 3)
        out = torch.zeros((B, C, m), dtype=grad_out.dtype)
        return out.scatter_add_(2, ix, contrib)

    mod.furthest_point_sampling = furthest_point_sampling
    mod.ball_query = ball_query
    mod.three_nn = three_nn
    mod.gather_points = gather_points
    mod.group_points = group_points
    mod.three_interpolate = three_interpolate
    mod.gather_points_grad = gather_points_grad
    mod.group_points_grad = group_points_grad
    mod.three_interpolate_grad = three_interpolate_grad
    return mod


def install_ext_shim():
    """Register the fake `pointnet2._ext` (idempotent). Must run before any
    reference-source import."""
    if "pointnet2._ext" not in sys.modules or not hasattr(
            sys.modules["pointnet2._ext"], "furthest_point_sampling"):
        sys.modules["pointnet2._ext"] = _make_ext_module()
    return sys.modules["pointnet2._ext"]


# ------------------------------------------------------- reference loading
def _add_reference_paths():
    """The reference uses flat intra-repo imports (`from backbone_module
    import ...`); its files also sys.path.append their own dirs at import
    (models/pq_transformer.py:8-10, backbone_module.py:11-16)."""
    for sub in ("", "models", "pointnet2", "utils"):
        p = os.path.join(REFERENCE_ROOT, sub) if sub else REFERENCE_ROOT
        if p not in sys.path:
            sys.path.append(p)


def neutralize_cuda():
    """Make Tensor.cuda()/Module.cuda() identity ops so reference code paths
    that pin constants to the GPU (models/pq_transformer.py:47) run on CPU."""
    import torch

    if getattr(torch.Tensor.cuda, "_omni_pq_shim", False):
        return
    def _tensor_cuda(self, *a, **k):
        return self
    _tensor_cuda._omni_pq_shim = True
    torch.Tensor.cuda = _tensor_cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self


def zero_dropout(model):
    """Zero every dropout in a reference model: nn.Dropout modules and the
    float `dropout` attr of the MHA fork (which calls F.dropout directly)."""
    import torch

    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        elif isinstance(getattr(m, "dropout", None), float):
            m.dropout = 0.0
    return model


def load_reference_pq_transformer(num_proposal: int = 256,
                                  num_quad_proposal: int = 256,
                                  eval_dropout: bool = True):
    """Instantiate the reference PQ_Transformer on CPU (train.py:324-343
    ctor arguments, ScanNet dataset statistics from this repo's config).

    eval_dropout: zero all dropout so BN-train-mode forwards are still
    deterministic (the reference hardcodes p=0.1, models/transformer.py:163).
    Covers both nn.Dropout modules and the float `dropout` attribute of the
    reference's MultiheadAttention fork, which applies F.dropout directly
    (models/utils/multi_head_attention.py:50,128).
    Returns the torch module (in eval() mode; caller may .train() it).
    """
    import torch

    install_ext_shim()
    neutralize_cuda()
    _add_reference_paths()
    from ..config import SCANNET_MEAN_SIZES

    import pq_transformer as ref_pq  # /root/reference/models/pq_transformer.py

    model = ref_pq.PQ_Transformer(
        input_feature_dim=0, num_class=18, num_proposal=num_proposal,
        num_quad_proposal=num_quad_proposal, num_heading_bin=1,
        num_size_cluster=18, mean_size_arr=SCANNET_MEAN_SIZES.copy(),
        sampling="vote")
    model.eval()
    if eval_dropout:
        zero_dropout(model)
    return model
