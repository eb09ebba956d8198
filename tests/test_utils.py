"""Utility-layer tests: callback logger, config system, profiling."""

import os

import numpy as np


def test_callback_logger_loop(tmp_path):
    from dstdgcn_tpu.utils.callbacks import CallbackLogger

    saves, evals, visuals = [], [], []
    losses = iter([{"l": 2.0}, {"l": 1.0}, {"l": 0.5}, {"l": 0.25}])
    log = CallbackLogger(str(tmp_path), name="train")
    log.add_loss_log(lambda: next(losses), loss_freq=1, window_size=2)
    log.add_save_log(lambda: saves.append(log.epoch), save_freq=2)
    log.add_eval_log(lambda: evals.append(log.epoch), eval_freq=1)
    log.add_metric_log(
        lambda: (np.ones(3), np.zeros(3)),
        [("mae", lambda p, t: float(np.abs(p - t).mean()))],
        metrics_freq=1)
    log.add_visual_log(lambda it: visuals.append(it), visual_freq=2)

    for _ in range(2):
        desc = log.step()
    assert "l " in desc and visuals == [2]
    m = log.end_epoch()
    assert m == {"mae": 1.0}
    assert evals == [1] and saves == []
    for _ in range(2):
        log.step()
    log.end_epoch()
    assert saves == [2] and evals == [1, 2]
    assert os.path.exists(tmp_path / "train_loss.csv")
    assert os.path.exists(tmp_path / "train_metrics.yaml")
    rows = open(tmp_path / "train_loss.csv").read().splitlines()
    assert rows[0] == "epoch,l" and len(rows) == 3


def test_update_config_override():
    """Recursive key overwrite (reference utils/misc.py:90-105 semantics)."""
    from dstdgcn_tpu.utils.config import EasyDict, update_config

    cfg = EasyDict({"a": 1, "nested": {"b": 2, "a": 3}})
    update_config(cfg, {"a": 5, "b": 7})
    assert cfg["a"] == 5
    assert cfg["nested"]["b"] == 7 and cfg["nested"]["a"] == 5
