"""Training driver — the reference train.py re-built on the jitted TPU step.

Same CLI flag surface (cli/args.py), same loop structure (train.py:347-433):
labeled + endless-weak double batches, per-iteration cosine LR, periodic
evaluation of student and EMA teacher with quad-F1 / mAP, best / ema_best /
periodic / last checkpoints. Data-parallel over all local devices via the
mesh in parallel/ (replicated params, batch sharded).

Run:  python -m omni_pq_tpu.cli.train --ema --gamma_mixture --pc_loss \
          --end_proportion 0.1 --data_root <scannet_root>
      (add --synthetic_data for a smoke run without data on disk)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from .args import parse_option


def make_model_config(args):
    from ..config import ModelConfig
    kw = dict(
        num_proposal=args.num_target, num_quad_proposal=args.quad_num_target,
        num_decoder_layers=args.num_decoder_layers, nhead=args.nhead,
        dim_feedforward=args.dim_feedforward,
        dropout=args.transformer_dropout, num_points=args.num_point,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        input_feature_dim=int(args.use_color) * 3 + int(args.use_height))
    if args.smoke:
        kw.update(num_proposal=16, num_quad_proposal=16, num_decoder_layers=2,
                  hidden_dim=32, nhead=4, dim_feedforward=64,
                  backbone_width=1, backbone_npoints=(128, 64, 32, 16),
                  backbone_nsamples=(8, 8, 8, 8), vote_aggregation_nsample=8,
                  num_points=args.num_point)
    return ModelConfig(**kw)


def get_datasets(args):
    from ..data import (ScannetDetectionDataset, ARKitSceneDataset)
    from ..data.synthetic import SyntheticDataset

    if args.synthetic_data:
        labeled = SyntheticDataset(32, args.num_point, seed=args.rng_seed)
        weak = SyntheticDataset(32, args.num_point, seed=args.rng_seed + 1)
        val = SyntheticDataset(8, args.num_point, seed=args.rng_seed + 2)
        return labeled, weak, val
    labeled = ScannetDetectionDataset(
        args.data_root, "train", num_points=args.num_point,
        use_color=args.use_color, use_height=args.use_height, augment=False,
        start_proportion=args.start_proportion,
        end_proportion=args.end_proportion, seed=args.rng_seed)
    if args.arkit:
        # omni-supervised mode: weak ARKit boxes for training, the
        # human-annotated ARKit valid split for evaluation (train.py:230-253)
        weak = ARKitSceneDataset(args.arkit_data_root, "train",
                                 num_points=args.num_point,
                                 seed=args.rng_seed + 1)
        val = ARKitSceneDataset(args.arkit_data_root, "valid",
                                num_points=args.num_point,
                                seed=args.rng_seed + 2)
    else:
        weak = ScannetDetectionDataset(
            args.data_root, "train", num_points=args.num_point,
            use_color=args.use_color, use_height=args.use_height,
            augment=False, start_proportion=0.0, end_proportion=1.0,
            seed=args.rng_seed + 1)
        val = ScannetDetectionDataset(
            args.data_root, "val", num_points=args.num_point,
            use_color=args.use_color, use_height=args.use_height,
            augment=False, seed=args.rng_seed + 2)
    return labeled, weak, val


def evaluate(args, model, state, val_loader, dataset_config, logger,
             use_ema=False, max_batches=None, mesh=None, metrics=None,
             epoch=0):
    """evaluate_one_epoch (train.py:609-768): quad F1 + object mAP, plus the
    reference's eval-time supervised loss stat_dict (train.py:638-668) on
    val batches that carry the full label set — means are logged and written
    to metrics.jsonl under eval_{student|ema}/.

    With `mesh` set (multi-process runs), each process forwards its shard of
    the val split as one global sharded computation, outputs are allgathered
    to every host, and every process computes the full-set metrics — exact
    single-host semantics (the reference's DistributedSampler eval computes
    shard-local metrics per rank instead)."""
    import jax
    import jax.numpy as jnp
    from ..parallel import make_global_batch, gather_scenes
    from ..train import (make_eval_step, make_eval_decode_step,
                         unpack_eval_outputs)
    from ..evals import (parse_quad_predictions, parse_quad_groundtruths,
                         parse_predictions, parse_groundtruths,
                         QuadAPCalculator, APCalculator)

    config_dict = {"remove_empty_box": False, "use_3d_nms": True,
                   "nms_iou": 0.25, "use_old_type_nms": False,
                   "cls_nms": True, "per_class_proposal": True,
                   "conf_thresh": 0.0, "quad_thresh": 0.5,
                   "dataset_config": dataset_config,
                   "nms_iou_quad": args.nms_iou_quad}
    quad_calc = QuadAPCalculator(ap_iou_thresh=args.ap_iou_thresholds[0])
    obj_calcs = {t: APCalculator(ap_iou_thresh=t)
                 for t in args.ap_iou_thresholds}

    # eval-time supervised loss stats (reference train.py:638-668), computed
    # on device inside the decode jit; packed outputs keep the per-batch
    # host fetch to ~3 buffers (a full 119-key end_points fetch measured
    # 11.5 s/batch through the remote-TPU transport, TUNING.md)
    from .. import losses as _losses
    mean_sizes = np.asarray(dataset_config.mean_size_arr, np.float32)
    # --faster_eval is the reference eval.py's quad-only mode: skip the
    # object packing (97 of 107 floats/proposal) at the source, not just
    # the metric computation — unless the dump path needs the boxes
    include_obj = (not args.faster_eval) or bool(args.dump_result)
    decode_step = make_eval_decode_step(
        model, mean_sizes,
        quad_topk=int(getattr(args, "eval_quad_topk", 0) or 0),
        include_obj=include_obj)
    eval_step = None  # full forward, built lazily (multiproc / dump paths)
    loss_stats_fn = jax.jit(lambda d: jax.tree.map(
        lambda x: x, _losses.get_loss(
            d, mean_sizes, num_layer=model.cfg.num_decoder_layers)[1]))
    loss_sums: dict = {}
    loss_batches = 0
    _LOSS_KEYS = ("vote_label", "center_label", "gt_quad_centers")
    # --eval_quad_topk losslessness check (see make_eval_decode_step): rows
    # are confidence-sorted, so truncation can only drop F1 corners when the
    # LAST KEPT row still clears the strict QUAD_THRES gate. Counted per
    # scene here, warned once per eval pass below.
    quad_topk = int(getattr(args, "eval_quad_topk", 0) or 0)
    topk_overflow_scenes = 0

    def _unpack(obj, quad):
        return unpack_eval_outputs(
            obj, quad, model.cfg.num_heading_bin,
            model.cfg.num_size_cluster, model.cfg.num_class)

    multiproc = mesh is not None and len(mesh.devices.flat) > 1
    for bi, batch in enumerate(val_loader):
        if max_batches is not None and bi >= max_batches:
            break
        if multiproc:
            import jax as _jax
            if eval_step is None:
                eval_step = make_eval_step(model)
            pc = np.asarray(batch["point_clouds"])
            true_b, n_local = pc.shape[0], _jax.local_device_count()
            padded_b = -(-true_b // n_local) * n_local
            if padded_b != true_b:
                pc = np.concatenate([pc, pc[: padded_b - true_b]], axis=0)
            ep = eval_step(state, make_global_batch({"pc": pc}, mesh)["pc"],
                           use_ema=use_ema)
            ep = gather_scenes(ep)
            if padded_b != true_b:  # drop per-process padding rows
                def _trim(a):
                    p = a.shape[0] // padded_b
                    return a.reshape((p, padded_b) + a.shape[1:])[:, :true_b] \
                            .reshape((p * true_b,) + a.shape[1:])
                ep = {k: _trim(v) for k, v in ep.items()}
            batch = gather_scenes(batch)
            merged = dict(ep)
            merged.update(batch)
            if all(k in merged for k in _LOSS_KEYS):
                arrs = {k: np.asarray(v) for k, v in merged.items()
                        if getattr(np.asarray(v).dtype, "kind", "O") in "fiub"}
                st = jax.device_get(loss_stats_fn(arrs))
                for k, v in st.items():
                    loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
                loss_batches += 1
        else:
            with_loss = all(k in batch for k in _LOSS_KEYS)
            labels = None
            if with_loss:
                labels = {k: np.asarray(v) for k, v in batch.items()
                          if getattr(np.asarray(v).dtype, "kind", "O")
                          in "fiub"}
            obj, quad, vec = decode_step(
                state, jnp.asarray(batch["point_clouds"]), labels,
                use_ema=use_ema, with_loss=with_loss)
            ep = _unpack(None if obj is None else np.asarray(obj),
                         np.asarray(quad))
            if quad_topk:
                from ..evals.quad import softmax as _qsoftmax, QUAD_THRES
                tail_prob = _qsoftmax(
                    np.asarray(ep["last_quad_scores"]))[:, -1, 1]
                topk_overflow_scenes += int((tail_prob > QUAD_THRES).sum())
            if vec is not None:
                for k, v in zip(decode_step.stat_names, np.asarray(vec)):
                    loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
                loss_batches += 1
            merged = dict(ep)
            merged.update(batch)
        pred_cls, _, pred_corners = parse_quad_predictions(
            merged, config_dict, "last_")
        gt_cls, gt_corners = parse_quad_groundtruths(merged, config_dict)
        quad_calc.step(pred_cls, gt_cls, pred_corners, gt_corners,
                       list(batch["horizontal_quads"]))
        # ARKit valid batches carry quad GT only (arkitscenes_dataset.py
        # valid split) — object mAP needs the full ScanNet label set
        if not args.faster_eval and "box_label_mask" in batch:
            obj_pred, _ = parse_predictions(merged, config_dict, "last_")
            obj_gt = parse_groundtruths(merged, config_dict)
            for calc in obj_calcs.values():
                calc.step(obj_pred, obj_gt)

        if args.dump_result and bi == 0:
            from ..utils.viz import dump_quad_results, dump_object_results
            dump_dir = os.path.join(args.log_dir, "dump")
            dump_quad_results(ep, dump_dir)
            if "last_objectness_scores" in ep:
                dump_object_results(ep, dataset_config, dump_dir)

    f1 = quad_calc.compute_F1(calculated=True)
    tag = "ema" if use_ema else "student"
    if quad_topk and topk_overflow_scenes:
        logger.warning(
            f"[eval:{tag}] --eval_quad_topk {quad_topk} truncated "
            f"above-gate proposals in {topk_overflow_scenes} scene evals "
            f"(the lowest kept row still cleared the 0.5 confidence gate) "
            f"— quad F1 is a LOWER BOUND this pass; raise --eval_quad_topk "
            f"or set it to 0")
    if loss_batches:
        means = {k: v / loss_batches for k, v in sorted(loss_sums.items())}
        shown = {k: means[k] for k in ("loss", "vote_loss", "objectness_loss",
                                       "box_loss", "quad_loss_sum")
                 if k in means}
        logger.info(f"[eval:{tag}] " + " ".join(
            f"{k} {v:.4f}" for k, v in shown.items()))
        if metrics is not None:
            metrics.log(epoch, means, prefix=f"eval_{tag}")
    logger.info(f"[eval:{tag}] quad F1 = {f1:.4f}")
    if not args.faster_eval:
        for t, calc in obj_calcs.items():
            metrics = calc.compute_metrics()
            logger.info(f"[eval:{tag}] mAP@{t} = {metrics['mAP']:.4f} "
                        f"AR = {metrics['AR']:.4f}")
    return f1


def main(argv=None):
    args = parse_option(argv)

    import jax
    if args.multihost:
        # before any device access (reference: init_process_group at
        # train.py:775-776 before model.cuda())
        from ..parallel import init_distributed
        init_distributed(args.coordinator_address, args.num_processes,
                         args.process_id)
    import jax.numpy as jnp
    from ..utils.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()
    from ..config import ModelConfig, DatasetConfig, SCANNET_MEAN_SIZES
    from ..data import Loader, PrefetchLoader, endless
    from ..models import PQTransformer
    from ..parallel import make_mesh, make_global_batch, replicate
    from ..train import (TrainFlags, OptimizerConfig, create_train_state,
                         make_train_step, consistency_weight,
                         save_checkpoint, load_checkpoint)
    from ..utils.logger import setup_logger
    from ..utils.metrics import MetricsLogger

    os.makedirs(args.log_dir, exist_ok=True)
    logger = setup_logger(args.log_dir, distributed_rank=jax.process_index())
    logger.info(" ".join(sys.argv))
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    metrics = MetricsLogger(args.log_dir) if jax.process_index() == 0 else None

    labeled_ds, weak_ds, val_ds = get_datasets(args)
    logger.info(f"datasets: labeled {len(labeled_ds)} weak {len(weak_ds)} "
                f"val {len(val_ds)}")

    mesh = make_mesh()
    n_dev = mesh.devices.size
    # --batch_size is the PER-PROCESS batch (like the reference's per-GPU
    # bs); pad it up to a multiple of the local device count so the global
    # batch tiles the data axis evenly
    n_local = jax.local_device_count()
    local_bs = args.batch_size
    if local_bs % n_local != 0 and n_local > 1:
        local_bs = -(-local_bs // n_local) * n_local
        logger.info(f"batch size padded {args.batch_size} -> {local_bs} for "
                    f"{n_local} local devices")

    train_loader = PrefetchLoader(
        Loader(labeled_ds, local_bs, seed=args.rng_seed,
               shard_id=jax.process_index(),
               num_shards=jax.process_count()),
        num_workers=args.num_workers)
    weak_iter = endless(PrefetchLoader(
        Loader(weak_ds, local_bs, seed=args.rng_seed + 1),
        num_workers=args.num_workers))
    val_loader = Loader(val_ds, min(16, len(val_ds)), shuffle=False,
                        drop_last=False, shard_id=jax.process_index(),
                        num_shards=jax.process_count())

    cfg = make_model_config(args)
    dataset_config = DatasetConfig()
    model = PQTransformer(cfg)

    rng = jax.random.PRNGKey(args.rng_seed)
    sample = next(iter(train_loader))
    variables = jax.jit(model.init)(rng, jnp.asarray(sample["point_clouds"]))
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model: {n_params / 1e6:.2f}M params, {n_dev} devices")

    iters_per_epoch = max(len(train_loader), 1)
    warmup_steps = (args.warmup_epoch * iters_per_epoch
                    if args.warmup_epoch > 0 else 0)
    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        decoder_learning_rate=args.decoder_learning_rate,
        weight_decay=args.weight_decay, clip_norm=args.clip_norm,
        total_steps=(args.max_epoch - max(args.warmup_epoch, 0)) * iters_per_epoch,
        warmup_steps=warmup_steps, warmup_multiplier=args.warmup_multiplier,
        step_freq=args.step_freq)
    state = create_train_state(variables, opt_cfg, ema=True)
    start_epoch = args.start_epoch
    if args.checkpoint_path:
        state, ckpt_epoch, _ = load_checkpoint(args.checkpoint_path, state)
        start_epoch = ckpt_epoch + 1
        logger.info(f"resumed from {args.checkpoint_path} at epoch {ckpt_epoch}")
    state = replicate(state, mesh)

    flags = TrainFlags(
        ema=args.ema, gamma_mixture=args.gamma_mixture, arkit=args.arkit,
        pc_loss=args.pc_loss, use_fitted_mixture=args.use_fitted_mixture,
        teacher_bf16=args.teacher_bf16, ema_decay=args.ema_decay,
        lambda_metric_normal=args.lambda_metric_normal,
        lambda_metric_vertical=args.lambda_metric_vertical,
        lambda_metric_size=args.lambda_metric_size,
        lambda_metric_score=args.lambda_metric_score,
        lambda_arkit_pc_loss=args.lambda_arkit_pc_loss,
        near_threshold=args.near_threshold, far_threshold=args.far_threshold)
    train_step = make_train_step(model, cfg, SCANNET_MEAN_SIZES, flags,
                                 donate=True)

    f1, ema_f1, max_f1, max_ema_f1 = 0.0, 0.2, 0.0, 0.2
    # In-step randomness (dropout masks, gamma EM sampling) uses the
    # TPU-native hardware PRNG by default: threefry mask generation fused
    # through the attention graph measured 23.3 ms of the 133.7 ms step
    # (133.7 -> 110.4 ms/step with rbg; benchmarks/TUNING.md). --threefry
    # restores the counter-based stream (e.g. for cross-backend
    # reproducibility of a specific run).
    step_rng = (jax.random.PRNGKey(args.rng_seed + 123) if args.threefry
                else jax.random.key(args.rng_seed + 123, impl="rbg"))
    profile_dir = os.path.join(args.log_dir, "profile")
    prof_start = 2 if args.profile else -1  # step 1 includes compile
    prof_stop = prof_start + args.profile
    global_step = 0
    for epoch in range(start_epoch, args.max_epoch + 1):
        train_loader.set_epoch(epoch)
        tic = time.time()
        stat_acc, n_acc = {}, 0
        cw = consistency_weight(epoch, args.consistency_weight,
                                args.consistency_rampup)
        for batch_idx, batch in enumerate(train_loader):
            weak = next(weak_iter)
            lb = make_global_batch(batch, mesh)
            wk = make_global_batch(weak, mesh)
            step_rng, k = jax.random.split(step_rng)
            global_step += 1
            if global_step == prof_start:
                jax.profiler.start_trace(profile_dir)
            state, stats = train_step(state, lb, wk, k, jnp.float32(cw))
            if args.profile and global_step == prof_stop:
                np.asarray(stats["total_loss"])  # drain the dispatch queue
                jax.profiler.stop_trace()
                logger.info(f"profiler trace ({args.profile} steps) written "
                            f"to {profile_dir}")
            # keep stats on device; a host fetch per step would add a full
            # dispatch+sync round trip to every iteration
            for key in ("total_loss", "loss", "vote_loss", "objectness_loss",
                        "box_loss", "quad_loss_sum", "consistency_loss",
                        "weighted_consistency_loss",
                        "gamma_mixture_filter_loss", "arkit_pc_loss",
                        "arkit_collisions", "grad_norm"):
                if key in stats:
                    stat_acc[key] = stat_acc.get(key, 0.0) + stats[key]
            n_acc += 1
            if (batch_idx + 1) % args.print_freq == 0:
                msg = " ".join(f"{k} {float(v) / n_acc:.4f}"
                               for k, v in sorted(stat_acc.items()))
                logger.info(f"Train: [{epoch}][{batch_idx + 1}/"
                            f"{len(train_loader)}] {msg}")
                if metrics is not None:
                    metrics.log(global_step,
                                {k: float(v) / n_acc
                                 for k, v in stat_acc.items()},
                                prefix="train")
                stat_acc, n_acc = {}, 0
        logger.info(f"epoch {epoch}, total time {time.time() - tic:.2f}s")

        if epoch % args.val_freq == 1 or args.val_freq == 1:
            eval_mesh = mesh if jax.process_count() > 1 else None
            f1 = evaluate(args, model, state, val_loader, dataset_config,
                          logger, use_ema=False, mesh=eval_mesh,
                          metrics=metrics, epoch=epoch)
            ema_f1 = evaluate(args, model, state, val_loader, dataset_config,
                              logger, use_ema=True, mesh=eval_mesh,
                              metrics=metrics, epoch=epoch)
            if metrics is not None:
                metrics.log(global_step, {"quad_f1": f1, "ema_quad_f1": ema_f1,
                                          "epoch": epoch}, prefix="eval")
            if jax.process_index() == 0:
                if f1 > max_f1:
                    save_checkpoint(args.log_dir, "best", state, epoch)
                    max_f1 = f1
                if ema_f1 > max_ema_f1:
                    save_checkpoint(args.log_dir, "ema_best", state, epoch)
                    max_ema_f1 = ema_f1
        if jax.process_index() == 0 and epoch % args.save_freq == 0:
            save_checkpoint(args.log_dir, epoch, state, epoch)

    if jax.process_index() == 0:
        save_checkpoint(args.log_dir, "last", state, args.max_epoch)
    if metrics is not None:
        metrics.close()
    logger.info(f"done; best F1 {max_f1:.4f} ema {max_ema_f1:.4f}")
    return max_f1, max_ema_f1


if __name__ == "__main__":
    main()
