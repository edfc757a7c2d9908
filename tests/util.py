"""Shared test helpers: tiny model config + synthetic inputs."""
import numpy as np

from omni_pq_tpu.config import ModelConfig

TINY = ModelConfig(
    num_proposal=16,
    num_quad_proposal=16,
    num_decoder_layers=2,
    hidden_dim=32,
    nhead=4,
    dim_feedforward=64,
    backbone_width=1,
    backbone_depth=2,
    backbone_npoints=(128, 64, 32, 16),
    backbone_nsamples=(8, 8, 8, 8),
    backbone_radii=(0.2, 0.4, 0.8, 1.2),
    vote_aggregation_nsample=8,
    num_points=512,
)


def tiny_cloud(rng, batch=2, n=512):
    """A room-ish synthetic cloud offset from the origin (FPS skips ~0)."""
    pts = rng.uniform(size=(batch, n, 3)).astype(np.float32) * np.array(
        [4.0, 4.0, 2.5], np.float32) + 0.5
    return pts
