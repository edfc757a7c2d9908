"""Inference driver: one checkpoint + one point cloud -> layout quads +
object boxes (JSON + optional PLY dumps).

A serving-style entry point the reference lacks (its eval.py only computes
metrics): feed a raw .npy/.ply cloud, get decoded detections.

Run:  python -m omni_pq_tpu.cli.infer --checkpoint_path log/x/ckpt_epoch_best \
          --input scene.npy --output out.json [--dump_ply out_dir]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_cloud(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        arr = np.load(path)
        return arr[:, :3].astype(np.float32)
    if path.endswith(".ply"):
        from ..data.preprocess import read_ply_xyzrgb
        return read_ply_xyzrgb(path)[:, :3].astype(np.float32)
    raise ValueError(f"unsupported input {path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--input", required=True, help=".npy or .ply cloud")
    parser.add_argument("--output", default="detections.json")
    parser.add_argument("--dump_ply", default=None)
    parser.add_argument("--num_point", type=int, default=40000)
    parser.add_argument("--quad_conf", type=float, default=0.5)
    parser.add_argument("--obj_conf", type=float, default=0.5)
    parser.add_argument("--nms_iou_quad", type=float, default=0.25)
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..config import DatasetConfig
    from ..data.spatial import spatial_sort
    from ..evals import parse_quad_predictions, parse_predictions
    from ..models import PQTransformer
    from ..train import OptimizerConfig, create_train_state, load_checkpoint, make_eval_step
    from .train import make_model_config

    # reuse the train arg surface defaults for the model config
    from .args import parse_option
    margs = parse_option(["--num_point", str(args.num_point)]
                         + (["--smoke"] if args.smoke else [])
                         + (["--bf16"] if args.bf16 else []), is_eval=True)
    cfg = make_model_config(margs)
    model = PQTransformer(cfg)

    pts = load_cloud(args.input)
    rng = np.random.default_rng(0)
    if pts.shape[0] >= args.num_point:
        choice = rng.choice(pts.shape[0], args.num_point, replace=False)
    else:
        choice = rng.choice(pts.shape[0], args.num_point, replace=True)
    pts = pts[choice]
    pts = pts[spatial_sort(pts)]
    pc = jnp.asarray(pts[None])

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc)
    state = create_train_state(variables, OptimizerConfig(total_steps=1))
    state, _, tag = load_checkpoint(args.checkpoint_path, state)
    use_ema = tag == "ema_best"
    ep = make_eval_step(model)(state, pc, use_ema=use_ema)
    ep = {k: np.asarray(v) for k, v in ep.items()}

    config_dict = {"nms_iou_quad": args.nms_iou_quad, "conf_thresh": 0.0,
                   "use_old_type_nms": False, "dataset_config": DatasetConfig(),
                   "remove_empty_box": False, "use_3d_nms": True,
                   "cls_nms": True, "per_class_proposal": False,
                   "nms_iou": 0.25}
    _, quad_mask, _ = parse_quad_predictions(ep, config_dict, "last_")
    obj_pred, _ = parse_predictions(ep, config_dict, "last_")

    from ..evals.quad import softmax
    quad_prob = softmax(ep["last_quad_scores"])[0, :, 1]
    quads = []
    for j in range(quad_prob.shape[0]):
        if quad_mask[0, j] == 1 and quad_prob[j] > args.quad_conf:
            quads.append({
                "center": ep["last_quad_center"][0, j].tolist(),
                "normal": ep["last_normal_vector"][0, j].tolist(),
                "size": ep["last_quad_size"][0, j].tolist(),
                "score": float(quad_prob[j]),
            })
    objects = [{"class": int(c), "corners": np.asarray(box).tolist(),
                "score": float(s)}
               for (c, box, s) in obj_pred[0] if s > args.obj_conf]

    with open(args.output, "w") as f:
        json.dump({"quads": quads, "objects": objects}, f, indent=2)
    print(f"{len(quads)} quads, {len(objects)} objects -> {args.output}")

    if args.dump_ply:
        from ..utils.viz import dump_quad_results, write_ply_points
        os.makedirs(args.dump_ply, exist_ok=True)
        write_ply_points(pts, os.path.join(args.dump_ply, "input.ply"))
        dump_quad_results(ep, args.dump_ply, conf_thresh=args.quad_conf)
    return quads, objects


if __name__ == "__main__":
    main()
