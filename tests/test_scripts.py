"""End-to-end driver tests: run both script mains on a synthetic DAVIS tree
(SURVEY.md §4 implication (b)/(c) — the reference has no tests at all; its
QA is running these two scripts, so our suite must actually drive them)."""

import json
import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

TINY_STAGES = ((8, 8), (12, 12), (16, 16, 16), (16, 16, 16), (16, 16, 16))


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    from osvos_tpu.data.synthetic import generate

    return generate(str(tmp_path_factory.mktemp("davis")), height=64,
                    width=112, n_frames=4)


@pytest.fixture(scope="module")
def tiny_parent_ckpt(tmp_path_factory):
    """A parent checkpoint in the exact config the scripts' --tiny builds."""
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.utils.checkpoint import save_checkpoint

    config = ModelConfig(stages=TINY_STAGES, side_channels=8)
    params = init_osvos_params(jax.random.PRNGKey(3), config,
                               input_hw=(32, 48))
    path = str(tmp_path_factory.mktemp("ckpt") / "parent.ckpt")
    save_checkpoint(path, params, step=0)
    return path


def _run_main(monkeypatch, module_name, argv):
    import importlib

    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name + ".py"] + argv)
    mod.main()


@pytest.mark.slow
def test_train_parent_main(davis_tree, tmp_path, monkeypatch):
    save_root = str(tmp_path / "runs")
    _run_main(monkeypatch, "train_parent", [
        "--db_root", davis_tree, "--save_root", save_root, "--tiny",
        "--epochs", "2", "--batch_size", "2", "--n_ave_grad", "1",
        "--input_h", "64", "--input_w", "112", "--snapshot", "1",
        "--test_interval", "1", "--data_parallel", "2", "--lr", "1e-6"])
    assert os.path.exists(os.path.join(save_root, "models",
                                       "parent_epoch-1.ckpt"))
    scalars = os.path.join(save_root, "logs_parent", "scalars.jsonl")
    tags = {json.loads(l)["tag"] for l in open(scalars)}
    assert {"total_loss_epoch", "val_loss_epoch"} <= tags


@pytest.mark.slow
def test_train_online_main_int8_vis_eval(davis_tree, tiny_parent_ckpt,
                                         tmp_path, monkeypatch, capsys):
    """The full reference workflow + round-2 additions: fine-tune one
    sequence, quantize (int8 static scales off the first frame), infer,
    save PNGs + overlays + per-step loss scalars, evaluate J/F in-repo."""
    save_root = str(tmp_path / "runs")
    seq = "synth-val-a"
    n_steps = 4
    _run_main(monkeypatch, "train_online", [
        "--db_root", davis_tree, "--save_root", save_root, "--tiny",
        "--parent", tiny_parent_ckpt, "--seq_name", seq,
        "--steps", str(n_steps), "--n_ave_grad", "2", "--lr", "1e-6",
        "--infer_mode", "int8", "--vis_res", "--eval"])
    out = capsys.readouterr().out
    assert "inference [int8]" in out
    assert "J=" in out

    res = os.path.join(save_root, "Results", seq)
    ovl = os.path.join(save_root, "Overlays", seq)
    assert len(os.listdir(res)) == 4
    assert len(os.listdir(ovl)) == 4
    scalars = os.path.join(save_root, "logs", seq, "scalars.jsonl")
    recs = [json.loads(l) for l in open(scalars)]
    assert len(recs) == n_steps
    assert all(np.isfinite(r["value"]) for r in recs)


@pytest.mark.slow
def test_train_online_main_all_val_batched(davis_tree, tiny_parent_ckpt,
                                           tmp_path, monkeypatch, capsys):
    save_root = str(tmp_path / "runs")
    _run_main(monkeypatch, "train_online", [
        "--db_root", davis_tree, "--save_root", save_root, "--tiny",
        "--parent", tiny_parent_ckpt, "--all_val", "--batched", "--eval",
        "--steps", "2", "--n_ave_grad", "1", "--lr", "1e-6"])
    out = capsys.readouterr().out
    assert "J-mean=" in out
    for seq in ("synth-val-a", "synth-val-b"):
        assert len(os.listdir(os.path.join(save_root, "Results", seq))) == 4
