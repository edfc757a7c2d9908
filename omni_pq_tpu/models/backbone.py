"""PointNet++ backbone (models/backbone_module.py:21-139).

Channel plan with width=2, depth=2 (the reference default):
  sa1: 40000 -> 2048, r 0.2, ns 64, mlp [128,128,256]
  sa2:  2048 -> 1024, r 0.4, ns 32, mlp [256,256,512]
  sa3:  1024 ->  512, r 0.8, ns 16, mlp [256,256,512]
  sa4:   512 ->  256, r 1.2, ns 16, mlp [256,256,512]
  fp1: sa4 -> sa3, mlp [512,512]; fp2: sa3 -> sa2, mlp [512,288]
Seeds: 1024 x 288-d at the sa2 coordinates.

Note: seed_inds reproduces the reference's approximation
(backbone_module.py:135-137) of taking sa1_inds[:, :1024] as the seeds'
indices into the raw cloud — sa2's FPS subset is not actually the first 1024
sa1 points; the vote loss inherits this label noise exactly as the reference
does.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2 import SAModuleVotes, FPModule


class Pointnet2Backbone(nn.Module):
    input_feature_dim: int = 0
    width: int = 2
    depth: int = 2
    # (npoint per SA layer); shrink for small-scale tests
    out_dim: int = 288
    dtype: str = "float32"
    remat: bool = False
    npoints: tuple = (2048, 1024, 512, 256)
    nsamples: tuple = (64, 32, 16, 16)
    radii: tuple = (0.2, 0.4, 0.8, 1.2)
    # route every SA layer's MLP+max-pool through the fused Pallas kernel
    # (ops/fused_mlp.py) — the (B, S, K, C) activation chain never reaches
    # HBM; per-layer shapes that miss the kernel's tiling gate fall back to
    # SharedMLP (see SAModuleVotes.fused)
    fused: bool = False

    @nn.compact
    def __call__(self, pointcloud: jnp.ndarray, train: bool = False):
        """pointcloud (B, N, 3+input_feature_dim) -> dict of end points."""
        w, d = self.width, self.depth
        xyz = pointcloud[..., 0:3]
        features: Optional[jnp.ndarray] = (
            pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None)

        sa1 = SAModuleVotes(npoint=self.npoints[0], radius=self.radii[0],
                            nsample=self.nsamples[0],
                            mlp_channels=[64 * w] * d + [128 * w],
                            normalize_xyz=True, dtype=self.dtype,
                            remat=self.remat, fused=self.fused,
                            name="sa1")
        sa2 = SAModuleVotes(npoint=self.npoints[1], radius=self.radii[1],
                            nsample=self.nsamples[1],
                            mlp_channels=[128 * w] * d + [256 * w],
                            normalize_xyz=True, dtype=self.dtype,
                            remat=self.remat, fused=self.fused,
                            name="sa2")
        sa3 = SAModuleVotes(npoint=self.npoints[2], radius=self.radii[2],
                            nsample=self.nsamples[2],
                            mlp_channels=[128 * w] * d + [256 * w],
                            normalize_xyz=True, dtype=self.dtype,
                            remat=self.remat, fused=self.fused,
                            name="sa3")
        sa4 = SAModuleVotes(npoint=self.npoints[3], radius=self.radii[3],
                            nsample=self.nsamples[3],
                            mlp_channels=[128 * w] * d + [256 * w],
                            normalize_xyz=True, dtype=self.dtype,
                            remat=self.remat, fused=self.fused,
                            name="sa4")
        fp1 = FPModule(mlp_channels=[256 * w, 256 * w], dtype=self.dtype, name="fp1")
        fp2 = FPModule(mlp_channels=[256 * w, self.out_dim], dtype=self.dtype, name="fp2")

        end_points = {}
        xyz1, f1, inds1 = sa1(xyz, features, train=train)
        end_points["sa1_inds"], end_points["sa1_xyz"], end_points["sa1_features"] = inds1, xyz1, f1
        xyz2, f2, inds2 = sa2(xyz1, f1, train=train)
        end_points["sa2_inds"], end_points["sa2_xyz"], end_points["sa2_features"] = inds2, xyz2, f2
        xyz3, f3, _ = sa3(xyz2, f2, train=train)
        end_points["sa3_xyz"], end_points["sa3_features"] = xyz3, f3
        xyz4, f4, _ = sa4(xyz3, f3, train=train)
        end_points["sa4_xyz"], end_points["sa4_features"] = xyz4, f4

        up3 = fp1(xyz3, xyz4, f3, f4, train=train)
        up2 = fp2(xyz2, xyz3, f2, up3, train=train)
        end_points["fp2_features"] = up2
        end_points["fp2_xyz"] = xyz2
        num_seed = xyz2.shape[1]
        end_points["fp2_inds"] = inds1[:, :num_seed]
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = xyz2
        end_points["seed_features"] = up2
        return end_points
