"""Drive the H36M/CMU ActionRunner end to end on synthetic data.

The per-action runner (runner/action_runner.py — reference
runner/h36m.py / runner/cmu.py) needs dataset files the test image does
not have, so until round 5 its train/test/test-all orchestration (epoch
loop, per-action sweeps, CSV schemas, best-checkpoint tracking) had no
execution coverage at all — the CLI drives use the synthetic
SimpleRunner.  Here the dataset factory is patched to serve the
file-free Synthetic dataset per action, and all three modes run for
real, asserting the reference CSV schemas (runner/h36m.py:95-150,
253-261, 263-346).
"""

import os

import numpy as np
import pytest

from dstdgcn_tpu.data.datasets import Synthetic
from dstdgcn_tpu.runner import action_runner
from dstdgcn_tpu.utils.logging import setup_logger

ACTIONS = ["walking", "eating"]
IN_N, OUT_N = 10, 5


def _fake_define_actions(action, name):
    return list(ACTIONS)


def _fake_get_dataset(name, **opts):
    kw = dict(opts.get(name, opts))
    act = str(kw.get("actions", "all"))
    return Synthetic(layout="h36m", num_sequences=8, input_n=IN_N,
                     output_n=OUT_N, mode=str(kw.get("mode", "train")),
                     seed=abs(hash(act)) % 97)


def _config(tmp_path, mode):
    base = str(tmp_path) + os.sep
    dim_used = sorted(j * 3 + k for j in
                      [2, 3, 4, 5, 7, 8, 9, 10, 12, 13, 14, 15, 17, 18,
                       19, 21, 22, 25, 26, 27, 29, 30] for k in range(3))
    return {
        "runner": "h36m", "mode": mode,
        "train_batch_size": 4, "test_batch_size": 4,
        "num_workers": 0, "device": "cpu", "epoch": 1,
        "save": {"path": {"base": base, "files": base,
                          "checkpoints": base + "ckpt/",
                          "tensorboard": base, "visualize": base},
                 "files": []},
        "dataset": {"name": "h36m", "scale": False,
                    "train": {"h36m": {"actions": "all", "input_n": IN_N,
                                       "output_n": OUT_N, "mode": "train"}},
                    "test": {"h36m": {"input_n": IN_N, "output_n": OUT_N,
                                      "mode": "test"}}},
        "setting": {"input_n": IN_N, "output_n": OUT_N,
                    "eval_frame": [0, 1, 2, 4], "dim_used": dim_used,
                    "joint_to_ignore": [16, 20, 23, 24, 28, 31],
                    "joint_to_equal": [13, 19, 22, 13, 27, 30],
                    "save": False},
        "model": {"name": "dstdgcn", "load": False, "ckpt": None,
                  "dstdgcn": {"input_channels": 6, "input_time_frame": IN_N,
                              "output_time_frame": OUT_N,
                              "st_gcnn_dropout": 0.1,
                              "joints_to_consider": 22, "num_feature": 16,
                              "num_layers": 1, "layout": "h36m"}},
        "engine": {"learn": {"opt": "adam", "lr": 1e-3, "weight_decay": 0,
                             "gamma": 0.9, "step_size": 5},
                   "loss": {"joint": ["jl2", 1]}, "n_out": 1,
                   "transform": "tsc", "use_weight": False,
                   "inverse": True, "max_iter": 2},
    }


@pytest.fixture
def patched(monkeypatch):
    monkeypatch.setattr(action_runner, "get_dataset", _fake_get_dataset)
    monkeypatch.setattr(action_runner, "define_actions",
                        _fake_define_actions)


def _runner(tmp_path, mode):
    cfg = _config(tmp_path, mode)
    cfg["logger"] = setup_logger("test_ar", str(tmp_path), 0)
    return action_runner.H36MRunner(cfg)


def test_run_train_per_action_sweep_and_csv(tmp_path, patched):
    r = _runner(tmp_path, "train")
    r.run()
    csv = (tmp_path / "training_loss.csv").read_text().splitlines()
    # header: epoch, lr, train_loss, test_loss, 4 horizon heads (+best row)
    head = csv[0].split(",")
    assert head[:4] == ["epoch", "lr", "train_loss", "test_loss"]
    assert head[4:8] == ["3d80", "3d160", "3d320", "3d400"]
    assert len(csv) >= 3          # 1 epoch row + best row
    vals = np.array(csv[1].split(",")[1:], float)
    assert np.isfinite(vals).all()
    assert (tmp_path / "ckpt" / "last.ckpt").exists()
    assert (tmp_path / "ckpt" / "best.ckpt").exists()


def test_run_test_csv_schema(tmp_path, patched):
    r = _runner(tmp_path, "test")
    r.run()
    csv = (tmp_path / "testing_loss.csv").read_text().splitlines()
    head = csv[0].split(",")
    # test_loss + 4 global heads + per-action per-horizon columns
    assert head[0] == "test_loss"
    assert len(head) == 1 + 4 + len(ACTIONS) * 4
    assert any(h.startswith("walking3d") for h in head)
    vals = np.array(csv[1].split(","), float)
    assert np.isfinite(vals).all()


def test_run_test_all_per_frame_metrics(tmp_path, patched):
    r = _runner(tmp_path, "test-all")
    r.run()
    csv = (tmp_path / "testing_loss.csv").read_text().splitlines()
    head = csv[0].split(",")
    # action, avg, one column per output frame at 40ms steps
    assert head[:2] == ["action", "avg"]
    assert head[2:] == [str((i + 1) * 40) for i in range(OUT_N)]
    assert [row.split(",")[0] for row in csv[1:]] == ACTIONS + ["average"]
    for row in csv[1:]:
        vals = np.array(row.split(",")[1:], float)
        assert np.isfinite(vals).all()
