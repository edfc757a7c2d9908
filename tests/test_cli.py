"""End-to-end CLI smoke: 2 epochs of semi-supervised training on synthetic
rooms with the tiny model, then standalone eval on the saved checkpoint —
exercises the full stack (data -> jitted step -> metrics -> checkpoints)."""
import glob
import os

import numpy as np
import pytest

from omni_pq_tpu.cli import train as train_cli
from omni_pq_tpu.cli import eval as eval_cli

pytestmark = pytest.mark.slow


def test_train_then_eval(tmp_path):
    log_dir = str(tmp_path / "run")
    argv = ["--smoke", "--synthetic_data", "--num_point", "512",
            "--batch_size", "2", "--max_epoch", "2", "--end_proportion", "1.0",
            "--ema", "--pc_loss", "--val_freq", "1", "--save_freq", "1",
            "--print_freq", "4", "--log_dir", log_dir, "--faster_eval",
            "--profile", "2"]
    max_f1, max_ema_f1 = train_cli.main(argv)
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    ckpts = glob.glob(os.path.join(log_dir, "ckpt_epoch_*"))
    assert any(c.endswith("last") for c in ckpts)
    # metrics.jsonl carries train scalars and per-eval F1 records
    import json
    recs = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert any("train/total_loss" in r for r in recs)
    assert any("eval/quad_f1" in r for r in recs)
    # eval-time supervised loss stats on val batches (reference
    # evaluate_one_epoch, train.py:638-668) for both student and teacher
    assert any("eval_student/loss" in r for r in recs)
    assert any("eval_ema/loss" in r for r in recs)
    assert any("eval_student/vote_loss" in r for r in recs)
    # --profile wrote a trace a user can open in TensorBoard/XProf
    assert glob.glob(os.path.join(log_dir, "profile", "**", "*.xplane.pb"),
                     recursive=True)

    f1 = eval_cli.main(["--smoke", "--synthetic_data", "--num_point", "512",
                        "--batch_size", "2", "--faster_eval",
                        "--log_dir", str(tmp_path / "eval"),
                        "--checkpoint_path",
                        os.path.join(log_dir, "ckpt_epoch_last")])
    assert np.isfinite(f1)


def test_train_arkit_e2e(tmp_path):
    """--arkit omni-supervised smoke (VERDICT r2 #5): ScanNet labeled fixture
    + ARKit weak/valid fixtures on disk, the arkit pc loss engaged with a
    nonzero weight, and the valid-split quad-F1 eval path executed end to
    end. Reference path: train.py:230-253 + arkitscenes_dataset.py:202-231."""
    import json

    from tests.test_data import write_fake_scannet, write_fake_arkit

    rng = np.random.default_rng(0)
    scannet_root = str(tmp_path / "scannet")
    arkit_root = str(tmp_path / "arkit")
    # batch is padded up to the 8 virtual test devices -> every split needs
    # >= 8 + 1 scans for one full local batch
    write_fake_scannet(scannet_root, [f"scene{i:04d}_00" for i in range(9)],
                       rng)
    write_fake_arkit(arkit_root, [f"4104819{i}" for i in range(8)], rng,
                     valid_scans=["47331587", "47331588"])
    log_dir = str(tmp_path / "run")
    max_f1, _ = train_cli.main([
        "--smoke", "--num_point", "512", "--batch_size", "2",
        "--max_epoch", "1", "--end_proportion", "1.0", "--val_freq", "1",
        "--save_freq", "99", "--print_freq", "1", "--log_dir", log_dir,
        "--faster_eval", "--ema", "--pc_loss", "--arkit",
        "--lambda_arkit_pc_loss", "1.0",
        "--data_root", scannet_root, "--arkit_data_root", arkit_root])
    recs = [json.loads(l) for l in open(os.path.join(log_dir,
                                                     "metrics.jsonl"))]
    # the arkit pc loss actually engaged (nonzero with untrained proposals
    # vs random weak boxes) and the ARKit valid-split F1 eval ran
    ark = [r["train/arkit_pc_loss"] for r in recs
           if "train/arkit_pc_loss" in r]
    assert ark and any(v != 0.0 for v in ark), recs
    assert any("eval/quad_f1" in r for r in recs)
    assert np.isfinite(max_f1)


def test_infer_cli(tmp_path):
    # train a tiny model for 1 epoch, then run inference on a raw cloud
    log_dir = str(tmp_path / "run")
    train_cli.main(["--smoke", "--synthetic_data", "--num_point", "512",
                    "--batch_size", "2", "--max_epoch", "1",
                    "--end_proportion", "1.0", "--val_freq", "99",
                    "--save_freq", "99", "--print_freq", "99",
                    "--log_dir", log_dir, "--faster_eval"])
    from omni_pq_tpu.cli import infer as infer_cli
    from omni_pq_tpu.data.synthetic import make_scene
    scene = make_scene(np.random.default_rng(0), 2000)
    np.save(tmp_path / "scene.npy", scene["point_clouds"])
    out = str(tmp_path / "det.json")
    quads, objects = infer_cli.main([
        "--checkpoint_path", os.path.join(log_dir, "ckpt_epoch_last"),
        "--input", str(tmp_path / "scene.npy"), "--output", out,
        "--num_point", "512", "--smoke", "--quad_conf", "0.0",
        "--obj_conf", "0.0", "--dump_ply", str(tmp_path / "ply")])
    import json
    d = json.load(open(out))
    assert "quads" in d and "objects" in d
    assert os.path.exists(tmp_path / "ply" / "input.ply")
