"""The jitted semi-supervised train step (train.py:456-606 as one XLA graph).

One step = student forward on the double batch (labeled ‖ weak), teacher
forward on the independently-sampled ema point clouds, all four loss families
(supervised on the labeled half, gamma-mixture pseudo-labels on the weak
half, mean-teacher consistency on the full batch, ARKit pc loss), backward,
clipped AdamW update, and the EMA teacher update — with no host round trip
anywhere (the reference synchronizes per scene per step for the scipy gamma
fit, gamma_mixture_loss_util.py:63-69).

Batch dicts follow the reference dataset key names (§3.4 of SURVEY.md).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .. import losses
from .state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainFlags:
    """Static loss toggles (mirror the reference CLI flags)."""
    ema: bool = True
    gamma_mixture: bool = True
    arkit: bool = False
    pc_loss: bool = True
    use_fitted_mixture: bool = False
    # run the EMA-teacher forward in bfloat16 compute (params/EMA state stay
    # f32; the Pallas coordinate kernels stay f32). The teacher produces only
    # soft consistency targets (stop-gradient), so its activations tolerate
    # bf16; the student's supervised path is untouched. TPU-native win: the
    # teacher's convs are HBM-bandwidth-bound, so halving activation bytes
    # nearly halves its cost.
    teacher_bf16: bool = False
    ema_decay: float = 0.999
    lambda_metric_normal: float = 5e-4
    lambda_metric_vertical: float = 5e-4
    lambda_metric_size: float = 5e-4
    lambda_metric_score: float = 5e-4
    lambda_arkit_pc_loss: float = 0.0
    # GT-assignment radii (reference: 0.3/0.6 m, loss_helper_pq.py:17-18).
    # Overridable as a documented extension for small-scale regimes where
    # the fixed radii yield no positive assignments.
    near_threshold: float = 0.3
    far_threshold: float = 0.6


def make_train_step(model, cfg: ModelConfig, mean_size_arr,
                    flags: TrainFlags, donate: bool = False):
    """Returns jitted fn(state, labeled, weak, rng, consistency_weight) ->
    (state, stats). `labeled`/`weak` are dicts of fixed-shape arrays; `weak`
    may equal `labeled` when flags disable the semi-supervised path.

    donate=True donates the input TrainState buffers (params, EMA replica,
    optimizer moments — ~3x params of HBM) so XLA updates them in place
    instead of allocating + copying a fresh tree every step. Drivers that
    only ever use the returned state (the train loop pattern) should pass
    True; leave False when the caller reuses the input state afterwards
    (e.g. comparing before/after trees in tests)."""
    num_layer = cfg.num_decoder_layers
    teacher_model = model
    if flags.teacher_bf16:
        teacher_model = type(model)(
            dataclasses.replace(cfg, compute_dtype="bfloat16"))

    def loss_fn(params, batch_stats, ema_params, ema_batch_stats, labeled,
                weak, rng, consistency_weight):
        rng_drop, rng_ema_drop, rng_gamma = jax.random.split(rng, 3)
        if flags.ema or flags.gamma_mixture or flags.arkit:
            inputs = jnp.concatenate([labeled["point_clouds"],
                                      weak["point_clouds"]], axis=0)
        else:
            inputs = labeled["point_clouds"]
        B = labeled["point_clouds"].shape[0]

        ep, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs,
            train=True, rngs={"dropout": rng_drop}, mutable=["batch_stats"])

        stats: Dict[str, jnp.ndarray] = {}

        # 1. supervised loss on the labeled half
        gt_ep = {k: v[:B] for k, v in ep.items()}
        gt_ep.update(labeled)
        sup_loss, sup_stats = losses.get_loss(gt_ep, mean_size_arr,
                                              num_layer=num_layer,
                                              pc_loss=flags.pc_loss,
                                              near=flags.near_threshold,
                                              far=flags.far_threshold)
        stats.update(sup_stats)

        total = sup_loss

        # 2. gamma-mixture pseudo-labels on the weak half
        if flags.gamma_mixture:
            gm_ep = {k: v[B:] for k, v in ep.items()}
            gm_ep["point_clouds"] = weak["point_clouds"][..., :3]
            gm_ep["vertex_normals"] = weak["vertex_normals"]
            mn, mv, ms, msc, engaged = losses.gamma_mixture_guide_criterion(
                gm_ep, rng_gamma, use_fitted=flags.use_fitted_mixture)
            gm_loss = (flags.lambda_metric_normal * mn
                       + flags.lambda_metric_vertical * mv
                       + flags.lambda_metric_size * ms
                       + flags.lambda_metric_score * msc)
            stats["metric_normal"] = mn
            stats["metric_vertical"] = mv
            stats["metric_size"] = ms
            stats["metric_score"] = msc
            stats["gamma_mixture_filter_loss"] = gm_loss
            stats["gamma_engaged_frac"] = engaged
            total = total + gm_loss

        # 3. mean-teacher consistency over the full double batch
        new_ema_batch_stats = ema_batch_stats
        if flags.ema:
            ema_inputs = jnp.concatenate([labeled["ema_point_clouds"],
                                          weak["ema_point_clouds"]], axis=0)
            ema_ep, ema_mut = teacher_model.apply(
                {"params": ema_params, "batch_stats": ema_batch_stats},
                ema_inputs, train=True, rngs={"dropout": rng_ema_drop},
                mutable=["batch_stats"])
            # float32-ify only inexact leaves: ema_ep also carries integer
            # endpoint arrays (seed_inds/fp2_inds), which must stay integral
            # in case a consumer ever uses them as gather indices
            ema_ep = jax.lax.stop_gradient(jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.inexact) else a, ema_ep))
            new_ema_batch_stats = ema_mut["batch_stats"]
            cons_ep = dict(ep)
            for key in ["flip_x_axis", "flip_y_axis", "rot_mat", "scale"]:
                cons_ep[key] = jnp.concatenate([labeled[key], weak[key]], axis=0)
            cons_loss, cons_stats = losses.get_consistency_loss(
                cons_ep, ema_ep, mean_size_arr, num_layer=num_layer)
            cons_loss = cons_loss * consistency_weight
            stats.update(cons_stats)
            # keep cons_stats["consistency_loss"] (per-prefix object mean,
            # the reference's stat) distinct from the ramped-weight total
            stats["weighted_consistency_loss"] = cons_loss
            total = total + cons_loss

        # 4. ARKit omni-supervised pc loss on the weak half
        if flags.arkit:
            ark_loss, collisions = losses.get_arkit_pc_loss(
                ep, {"center_label": weak["center_label"],
                     "size_label": weak["size_label"],
                     "num_gt_boxes": weak["num_gt_boxes"]})
            ark_loss = ark_loss * flags.lambda_arkit_pc_loss
            stats["arkit_pc_loss"] = ark_loss
            stats["arkit_collisions"] = collisions
            total = total + ark_loss

        stats["total_loss"] = total
        return total, (stats, mutated["batch_stats"], new_ema_batch_stats)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, labeled: Dict, weak: Dict, rng,
                   consistency_weight) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (stats, new_bs, new_ema_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.ema_params,
            state.ema_batch_stats, labeled, weak, rng, consistency_weight)
        stats["grad_norm"] = optax_global_norm(grads)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs,
                              ema_batch_stats=new_ema_bs)
        if flags.ema:
            state = state.ema_update(flags.ema_decay)
        return state, stats

    return train_step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x * x) for x in leaves))


def make_eval_step(model):
    """Jitted inference forward (eval mode, running BN stats, no dropout)."""

    @functools.partial(jax.jit, static_argnames=("use_ema",))
    def eval_step(state: TrainState, point_clouds, use_ema: bool = False):
        params = state.ema_params if use_ema else state.params
        batch_stats = (state.ema_batch_stats if use_ema else state.batch_stats)
        return model.apply({"params": params, "batch_stats": batch_stats},
                           point_clouds, train=False)

    return eval_step


# metric-decode tensors (evals/{objects,quad}.py): packed on device into two
# arrays so the host fetches 2 buffers instead of one per end_points key —
# through the remote-TPU transport each fetch is a ~32 ms round trip, and a
# full 119-key end_points fetch measured 11.5 s per bs16 batch (TUNING.md)
_EVAL_OBJ_KEYS = ("objectness_scores", "center", "heading_scores",
                  "heading_residuals", "size_scores", "size_residuals",
                  "sem_cls_scores")
_EVAL_QUAD_KEYS = ("quad_scores", "quad_center", "normal_vector", "quad_size")


def _pack(ep, prefix, keys, topk: int = 0):
    planes = []
    for k in keys:
        v = ep[prefix + k]
        planes.append(v.reshape(v.shape[0], v.shape[1], -1)
                      .astype(jnp.float32))
    packed = jnp.concatenate(planes, axis=-1)
    if topk and topk < packed.shape[1]:
        # device-side confidence packing: keep the topk most confident
        # proposals (score logits are the first plane of both packings;
        # prob = softmax(logits)[..., 1], monotone in logit[1]-logit[0]).
        # Rows come back SORTED by confidence descending, so the host can
        # verify losslessness per scene: if row topk-1's prob is below its
        # own gate, no above-gate proposal was dropped (evals/quad.py F1
        # gates at 0.5, ap_helper_pq.py:447; greedy NMS survivors above
        # any score are unaffected by removing strictly-lower-score rows).
        conf = packed[..., 1] - packed[..., 0]
        _, idx = jax.lax.top_k(conf, topk)
        packed = jnp.take_along_axis(packed, idx[..., None], axis=1)
    return packed


def unpack_eval_outputs(obj_packed, quad_packed, num_heading_bin: int,
                        num_size_cluster: int, num_class: int,
                        prefix: str = "last_") -> Dict:
    """Host-side inverse of the device packing: two numpy arrays -> the
    end_points subset the eval decode reads. obj_packed may be None
    (quad-only eval, make_eval_decode_step(include_obj=False)) — the object
    keys are then simply absent."""
    import numpy as np

    out = {}
    if obj_packed is not None:
        B, K = obj_packed.shape[:2]
        widths = {"objectness_scores": 2, "center": 3,
                  "heading_scores": num_heading_bin,
                  "heading_residuals": num_heading_bin,
                  "size_scores": num_size_cluster,
                  "size_residuals": num_size_cluster * 3,
                  "sem_cls_scores": num_class}
        off = 0
        for k in _EVAL_OBJ_KEYS:
            w = widths[k]
            v = np.asarray(obj_packed[..., off:off + w])
            if k == "size_residuals":
                v = v.reshape(B, K, num_size_cluster, 3)
            out[prefix + k] = v
            off += w
    qwidths = {"quad_scores": 2, "quad_center": 3, "normal_vector": 3,
               "quad_size": 2}
    off = 0
    for k in _EVAL_QUAD_KEYS:
        w = qwidths[k]
        out[prefix + k] = np.asarray(quad_packed[..., off:off + w])
        off += w
    return out


def make_eval_decode_step(model, mean_size_arr=None, prefix: str = "last_",
                          obj_topk: int = 0, quad_topk: int = 0,
                          include_obj: bool = True):
    """Jitted eval forward returning ONLY what the metric path consumes:
    (obj_packed (B,K,W1), quad_packed (B,Kq,W2)[, loss_stat_names,
    loss_stats_vec]). With `labels` given (and mean_size_arr set), the
    reference's eval-time supervised loss stat_dict (train.py:638-668) is
    computed on device in the same jit and returned as one stacked vector —
    one extra fetch instead of ~30. The vector's key order is published on
    the returned function as `.stat_names` (filled at trace time, i.e.
    after the first with_loss call).

    obj_topk / quad_topk > 0 enable device-side confidence packing: only
    the topk most confident proposals (sorted descending) cross the tunnel.
    Quad-F1 is provably unchanged whenever the per-scene count of proposals
    above the 0.5 gate fits in quad_topk (check: last kept row's prob <
    gate — rows are sorted); a trained model keeps a small fraction, so
    this is lossless there and an explicit accuracy knob for random-init
    worst cases. Object mAP keeps every NMS survivor above the truncated
    ranking tail (removing strictly-lower-score rows cannot change higher
    rows' greedy-NMS fate); it is the standard top-k-detections-per-scene
    eval convention rather than bitwise AP parity, so it is OFF by
    default.

    include_obj=False drops the object packing entirely — the reference's
    standalone eval driver (eval.py) computes QUAD metrics only, and the
    object planes are 97 of the 107 packed floats per proposal; a quad-only
    eval that still fetches them pays ~10x the bytes for nothing. The first
    return value is then None."""
    stat_names: list = []

    @functools.partial(jax.jit, static_argnames=("use_ema", "with_loss"))
    def _jitted(state: TrainState, point_clouds, labels=None,
                use_ema: bool = False, with_loss: bool = False):
        params = state.ema_params if use_ema else state.params
        batch_stats = (state.ema_batch_stats if use_ema else state.batch_stats)
        ep = model.apply({"params": params, "batch_stats": batch_stats},
                         point_clouds, train=False)
        obj = (_pack(ep, prefix, _EVAL_OBJ_KEYS, topk=obj_topk)
               if include_obj else None)
        quad = _pack(ep, prefix, _EVAL_QUAD_KEYS, topk=quad_topk)
        if not with_loss:
            return obj, quad, None
        merged = dict(ep)
        merged.update(labels)
        _, stats = losses.get_loss(merged, mean_size_arr,
                                   num_layer=model.cfg.num_decoder_layers)
        names = sorted(stats)
        stat_names[:] = names  # trace-time capture
        vec = jnp.stack([jnp.asarray(stats[k]).astype(jnp.float32)
                         for k in names])
        return obj, quad, vec

    def step(state, point_clouds, labels=None, use_ema=False,
             with_loss=False):
        return _jitted(state, point_clouds, labels, use_ema=use_ema,
                       with_loss=with_loss)

    step.stat_names = stat_names
    return step
