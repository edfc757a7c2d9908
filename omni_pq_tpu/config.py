"""Model / dataset configuration.

One dataclass replaces the reference's argparse-duplicated constants
(train.py:42-138, scannet/model_util_scannet.py:14-71). The ScanNet dataset
statistics (18 classes, 1 heading bin, 18 size clusters, mean box sizes) are
data constants reproduced from scannet/meta_data/scannet_means.npz.
"""
from __future__ import annotations

import dataclasses

import numpy as np

# per-class mean box sizes (l, w, h); dataset statistic from the reference's
# scannet_means.npz (scannet/model_util_scannet.py:30)
SCANNET_MEAN_SIZES = np.array([
    [0.76966726, 0.81160211, 0.92573741],
    [1.876858, 1.84255952, 1.19315654],
    [0.61327999, 0.61486087, 0.71827014],
    [1.39550063, 1.51215451, 0.83443565],
    [0.97949596, 1.06751485, 0.63296875],
    [0.53166301, 0.59555772, 1.75001483],
    [0.96247056, 0.72462326, 1.14818682],
    [0.83221924, 1.04909355, 1.68756634],
    [0.21132214, 0.4206159, 0.53728459],
    [1.44400728, 1.89708334, 0.26985747],
    [1.02942616, 1.40407966, 0.87554322],
    [1.37664116, 0.65521793, 1.68131292],
    [0.66508189, 0.71111926, 1.29885307],
    [0.41999174, 0.37906947, 1.75139715],
    [0.59359559, 0.59124924, 0.73919014],
    [0.50867595, 0.50656087, 0.30136236],
    [1.15115265, 1.0546296, 0.49706794],
    [0.47535286, 0.49249493, 0.58021168],
], dtype=np.float32)

SCANNET_TYPES = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
                 'bookshelf', 'picture', 'counter', 'desk', 'curtain',
                 'refrigerator', 'showercurtrain', 'toilet', 'sink', 'bathtub',
                 'garbagebin']
SCANNET_NYU40_IDS = np.array([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28,
                              33, 34, 36, 39])


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """ScanNet detection config (scannet/model_util_scannet.py:14-71)."""
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    max_num_obj: int = 64
    max_num_quad: int = 32

    @property
    def mean_size_arr(self) -> np.ndarray:
        return SCANNET_MEAN_SIZES

    def class2angle(self, pred_cls, residual):
        # ScanNet boxes are axis-aligned; heading is always 0
        return 0.0

    def class2size(self, pred_cls: int, residual: np.ndarray) -> np.ndarray:
        return SCANNET_MEAN_SIZES[pred_cls] + residual

    def class2angle_batch(self, pred_cls, residual) -> np.ndarray:
        """Vectorized class2angle over (...) arrays (the reference's batched
        eval decode: utils/box_util.py:245-270 callers)."""
        return np.zeros(np.shape(pred_cls), dtype=np.float64)

    def class2size_batch(self, pred_cls, residual) -> np.ndarray:
        """Vectorized class2size: (...) int, (..., 3) -> (..., 3)."""
        return SCANNET_MEAN_SIZES[np.asarray(pred_cls)] + residual

    def param2obb(self, center, heading_class, heading_residual, size_class,
                  size_residual):
        obb = np.zeros((7,))
        obb[0:3] = center
        obb[3:6] = self.class2size(int(size_class), size_residual)
        obb[6] = -1 * self.class2angle(heading_class, heading_residual)
        return obb


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PQ-Transformer architecture (models/pq_transformer.py:123-194)."""
    input_feature_dim: int = 0
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_proposal: int = 256        # object queries
    num_quad_proposal: int = 256   # layout-quad queries
    num_decoder_layers: int = 6
    hidden_dim: int = 288
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    backbone_width: int = 2
    backbone_depth: int = 2
    backbone_npoints: tuple = (2048, 1024, 512, 256)
    backbone_nsamples: tuple = (64, 32, 16, 16)
    backbone_radii: tuple = (0.2, 0.4, 0.8, 1.2)
    vote_aggregation_nsample: int = 16
    num_points: int = 40000
    # mixed precision: 'float32' or 'bfloat16' compute for the Dense/MXU
    # path (params stay f32; BatchNorm/softmax/losses stay f32)
    compute_dtype: str = "float32"
    # rematerialize the SA-layer SharedMLP+max-pool in the backward pass:
    # recomputes the (B, npoint, nsample, C) intermediates (the step's
    # largest activations) instead of saving them to HBM — a bytes-for-FLOPs
    # trade on a step that rides the HBM roofline (benchmarks/ROOFLINE.md).
    # Numerics are unchanged (same forward values, same gradients).
    remat_sa: bool = False
    # fuse each SA layer's Dense->BN->ReLU chain + nsample max-pool into one
    # multi-phase Pallas kernel (ops/fused_mlp.py): the (B, S, K, C)
    # activations never reach HBM in the forward (the backward is a remat
    # through the plain chain, so gradients are bit-identical to the
    # unfused path given the same cotangents). Layers whose nsample/channel
    # widths miss the TPU tiling gate — and float64 validation runs — fall
    # back to SharedMLP automatically (ops/fused_mlp.supports).
    # Default OFF for training: measured on v5e (round 5, same box,
    # benchmarks/TUNING.md) the full train step REGRESSED 94.4 -> 110.9
    # ms/step — the backward remat re-materializes exactly the bytes the
    # forward saved, and the multi-phase recompute is pure overhead on top.
    # There is NO separate grad-free wiring: this one flag routes every
    # forward (student, EMA teacher, eval) through the kernel, so the
    # default stays OFF until a grad-free case measures a win
    # (OMNI_PQ_FUSE=1 on scripts/bench_eval.py / bench.py flips it for a
    # measurement run).
    fused_sa: bool = False
    # Deviation from the reference (documented): QuadPredictHead normalizes
    # predicted normals per-vector. The reference divides by the *global*
    # tensor norm (models/pq_transformer.py:112-113) — per-vector is the
    # evidently intended semantics; losses are cosine-based so only the
    # physical-constraint loss magnitude is affected. Set False to emulate.
    quad_normal_per_vector_norm: bool = True


DEFAULT_MODEL = ModelConfig()
DEFAULT_DATASET = DatasetConfig()
