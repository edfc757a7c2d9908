"""PointNet++ modules (flax.linen, channel-last, static shapes).

Rebuilds the reference's pointnet2/pointnet2_modules.py:
  - SharedMLP        <- pytorch_utils.SharedMLP (conv1x1 + BN + ReLU stacks)
  - SAModuleVotes    <- PointnetSAModuleVotes:164-272 (FPS -> ball query ->
                        group -> shared MLP -> max pool)
  - FPModule         <- PointnetFPModule:356-416 (3-NN inverse-distance
                        interpolation + shared MLP)

Design notes (TPU): everything is channel-last so the 1x1 convs become plain
Dense matmuls on the MXU over a flattened (B*npoint*nsample, C) batch; the
nsample max-pool is a lane-friendly reduction; BatchNorm statistics are taken
over all non-channel axes, which under jit-with-sharded-batch equals the
reference's SyncBatchNorm semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import (fps, ball_query, ball_query_group, gather_points,
                   group_points, interpolate_features)
from ..ops import fused_mlp

# torch BN defaults: eps 1e-5; the model sets momentum=0.1 (torch convention:
# new = 0.9*old + 0.1*batch) == flax momentum 0.9
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def acc_dtype(dtype):
    """Accumulator dtype for BN / softmax / residual paths that must not run
    in reduced precision: float32 under the bf16/f32 compute design points
    (identical numerics to the former hard jnp.float32 pins), promoted to
    float64 under a `compute_dtype="float64"` numerics-validation run — a
    hard f32 pin would silently cap a double-precision backward-parity check
    at single precision."""
    return jnp.promote_types(dtype, jnp.float32)


def _mlp_pool(mdl: "SAModuleVotes", grouped, train):
    """SharedMLP + nsample max-pool, split out so SAModuleVotes can remat it.

    The (B, npoint, nsample, C) MLP intermediates are the largest activations
    in the train step (sa1: ~1.6 GB of backward saves in f32); under
    `nn.remat` they are recomputed from the tiny grouped input instead of
    written to + read back from HBM — a bytes-for-FLOPs trade in the step's
    favor, since the step rides the HBM roofline (benchmarks/ROOFLINE.md).
    First arg is the module so flax lifts the scope: param paths stay
    `<sa>/mlp/layer*` bit-identical to the unrematted tree.
    """
    out = SharedMLP(mdl.mlp_channels, dtype=mdl.dtype,
                    name="mlp")(grouped, train=train)
    return jnp.max(out, axis=2)


class SharedMLP(nn.Module):
    """Dense + BatchNorm + ReLU stack applied pointwise over the last axis.

    `dtype` is the matmul compute dtype (bf16 mixed precision when set);
    BatchNorm keeps float32 statistics either way."""
    channels: Sequence[int]
    bn: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.bn, dtype=self.dtype,
                         name=f"layer{i}")(x)
            if self.bn:
                # BN compute dtype follows the MLP: under bf16 the normalize
                # output stays bf16 so the whole (B, S, K, C) activation
                # chain (BN -> relu -> next Dense -> max-pool) moves half the
                # bytes — this chain is where the step's HBM traffic lives.
                # Statistics are still accumulated in f32 (flax upcasts for
                # mean/var) and running stats are stored f32 (param_dtype).
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class _DenseParam(nn.Module):
    """Declares a Dense kernel under the same scope path as nn.Dense would
    (`<parent>/layer{i}/kernel`) without instantiating the layer -- the
    fused SA-MLP kernel consumes the raw array. Init matches nn.Dense's
    default (lecun_normal), so fresh-training initializations are
    distributionally identical to the unfused path."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features), jnp.float32)


class _BNParam(nn.Module):
    """Declares BatchNorm scale/bias params and running-stat variables with
    nn.BatchNorm's names ('scale'/'bias' in params, 'mean'/'var' in
    batch_stats) so the fused and unfused trees are interchangeable."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,),
                                                  jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,),
                                                jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedMLPPool(nn.Module):
    """SharedMLP + nsample max-pool via the fused Pallas kernel
    (ops/fused_mlp.py): no (B, S, K, C) intermediate ever reaches HBM.

    Drop-in for `SharedMLP(...)(x) |> max(axis=2)` with a bit-compatible
    param/batch_stats tree (same `layer{i}`/`bn{i}` child names), the same
    running-stat update rule as nn.BatchNorm (momentum convention
    new = m*old + (1-m)*batch), and gradients defined by the plain jnp
    recompute inside the custom VJP — bitwise the flax chain's forward,
    reassociation-ulp-equal gradients (tests/test_fused_mlp.py)."""
    channels: Sequence[int]
    dtype: str = "float32"

    @nn.compact
    def __call__(self, grouped, train: bool = False):
        cin = grouped.shape[-1]
        kernels, scales, biases, ras = [], [], [], []
        for i, c in enumerate(self.channels):
            kernels.append(_DenseParam(c, name=f"layer{i}")(cin))
            cin = c
            s, b, rm, rv = _BNParam(c, name=f"bn{i}")()
            scales.append(s)
            biases.append(b)
            ras.append((rm, rv))
        pooled, means, variances = fused_mlp.fused_mlp_pool(
            grouped, kernels, scales, biases,
            ra_means=tuple(rm.value for rm, _ in ras),
            ra_vars=tuple(rv.value for _, rv in ras),
            train=train, eps=BN_EPS, dtype=jnp.dtype(self.dtype))
        if train and not self.is_initializing():
            for (rm, rv), mu, var in zip(ras, means, variances):
                rm.value = BN_MOMENTUM * rm.value + (1 - BN_MOMENTUM) * mu
                rv.value = BN_MOMENTUM * rv.value + (1 - BN_MOMENTUM) * var
        return pooled


class SAModuleVotes(nn.Module):
    """Set abstraction: FPS -> ball query -> group -> SharedMLP -> max-pool.

    Matches PointnetSAModuleVotes (pointnet2_modules.py:164-272) with
    pooling='max', use_xyz=True. `mlp_channels` excludes the implicit +3 xyz
    input channels.
    """
    npoint: int
    radius: float
    nsample: int
    mlp_channels: Sequence[int]
    normalize_xyz: bool = False
    use_xyz: bool = True
    dtype: str = "float32"
    remat: bool = False
    # route the MLP+pool through the fused Pallas kernel (ops/fused_mlp.py)
    # when the shapes meet its tiling constraints; falls back to SharedMLP
    # otherwise (float64 validation runs, odd channel widths)
    fused: bool = False

    @nn.compact
    def __call__(self, xyz, features: Optional[jnp.ndarray] = None,
                 inds: Optional[jnp.ndarray] = None, train: bool = False):
        """xyz (B,N,3), features (B,N,C) -> new_xyz (B,npoint,3),
        new_features (B,npoint,C_out), inds (B,npoint)."""
        if inds is None:
            inds = fps(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)
        # fused kernel: neighbor indices + relative xyz in one pass (the
        # separate per-row gather was the single hottest XLA op at sa1).
        # Feature grouping stays the XLA gather: the fully-fused
        # ball_query_group_feats (one-hot MXU feature deposit) was measured
        # a net step REGRESSION here — 95.4-95.8 vs 94.0-94.1 ms/step —
        # because sa2's K=32 deposit matmuls cost more than the take_along
        # rows they replace (benchmarks/TUNING.md round 4).
        idx, grouped_xyz = ball_query_group(self.radius, self.nsample, xyz,
                                            new_xyz)
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz
        if self.fused and fused_mlp.supports(self.nsample,
                                             self.mlp_channels, self.dtype):
            # same "mlp" scope name -> param/batch_stats trees identical to
            # the SharedMLP path; remat is moot here (the kernel saves no
            # (B, S, K, C) intermediates to begin with)
            pooled = FusedMLPPool(self.mlp_channels, dtype=self.dtype,
                                  name="mlp")(grouped, train=train)
            return new_xyz, pooled, inds
        pool = (nn.remat(_mlp_pool, static_argnums=(2,)) if self.remat
                else _mlp_pool)
        return new_xyz, pool(self, grouped, train), inds


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (PointnetSAModuleMSG /
    PointnetSAModuleMSGVotes, pointnet2_modules.py:78-158, 274-353): one FPS,
    several (radius, nsample, mlp) branches whose pooled features are
    concatenated. Unused by the reference's main path but part of its module
    surface."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    normalize_xyz: bool = False
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features: Optional[jnp.ndarray] = None,
                 inds: Optional[jnp.ndarray] = None, train: bool = False):
        if inds is None:
            inds = fps(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx = ball_query(radius, nsample, xyz, new_xyz)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / radius
            if features is not None:
                grouped = group_points(features, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
            else:
                grouped = grouped_xyz
            out = SharedMLP(mlp, name=f"mlp{i}")(grouped, train=train)
            outs.append(jnp.max(out, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class GroupAllModule(nn.Module):
    """GroupAll (pointnet2_utils.py:379-425): the whole cloud as one group
    followed by a SharedMLP + max-pool -> a single global feature."""
    mlp_channels: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features: Optional[jnp.ndarray] = None,
                 train: bool = False):
        grouped = xyz[:, None]  # (B, 1, N, 3)
        if features is not None:
            f = features[:, None]
            if self.use_xyz:
                grouped = jnp.concatenate([grouped, f], axis=-1)
            else:
                grouped = f
        out = SharedMLP(self.mlp_channels, name="mlp")(grouped, train=train)
        return jnp.max(out, axis=2)  # (B, 1, C)


class LFPModuleMSG(nn.Module):
    """Learnable multi-scale feature propagation (PointnetLFPModuleMSG,
    pointnet2_modules.py:418-497). Unused by the reference's main path but
    part of its module surface.

    Propagates features1 (at xyz1) onto xyz2: per (radius, nsample, mlp)
    scale, ball-group features1 around the xyz2 centers, SharedMLP +
    nsample max-pool, concat the xyz2-side skip features, then one shared
    post-MLP; scale outputs are concatenated on channels. Unlike the
    reference's torch spec, `mlps` lists OUTPUT channels only (Dense infers
    the input width, so there is no `mlp_spec[0] += 3` bookkeeping)."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    post_mlp: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz2, xyz1, features2: Optional[jnp.ndarray],
                 features1: Optional[jnp.ndarray], train: bool = False):
        """xyz2 (B,N2,3) targets, xyz1 (B,N1,3) sources, features2 (B,N2,C2)
        skip or None, features1 (B,N1,C1) -> (B, N2, len(mlps)*post[-1])."""
        post = SharedMLP(self.post_mlp, name="post_mlp")
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            # fused path is safe even though xyz2 centers are not drawn from
            # xyz1: no-hit rows get the reference padding semantics
            # (xyz1[0] - center) since round 4
            idx, grouped_xyz = ball_query_group(radius, nsample, xyz1, xyz2)
            if features1 is not None:
                grouped = group_points(features1, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
            else:
                grouped = grouped_xyz
            new = jnp.max(SharedMLP(mlp, name=f"mlp{i}")(grouped, train=train),
                          axis=2)  # (B, N2, mlp[-1])
            if features2 is not None:
                new = jnp.concatenate([new, features2], axis=-1)
            outs.append(post(new, train=train))
        return jnp.concatenate(outs, axis=-1)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance upsampling + SharedMLP.

    Matches PointnetFPModule (pointnet2_modules.py:356-416); channel concat
    order is [interpolated_known, skip] like the reference.
    """
    mlp_channels: Sequence[int]
    dtype: str = "float32"

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = False):
        interp = interpolate_features(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp_channels, dtype=self.dtype,
                         name="mlp")(interp, train=train)
