"""CLI smoke tests (train / train-prn / eval / predict on synthetic data)."""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from multiposenet_tpu.cli import main
from multiposenet_tpu.config import (
    Config, DetectorConfig, ModelConfig, PRNConfig, TrainConfig,
)


@pytest.fixture()
def tiny_config_file(tmp_path):
    cfg = Config(
        model=ModelConfig(backbone_width=0.25, fpn_channels=32,
                          head_channels=32),
        detector=DetectorConfig(pre_nms_top_k=50, max_detections=4,
                                score_threshold=0.0),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32,
                      max_persons=4),
        train=TrainConfig(
            image_size=64, batch_size=2, num_steps=2, warmup_steps=1,
            log_interval_steps=1,
            checkpoint_dir=str(tmp_path / "ck"),
        ),
    )
    p = tmp_path / "config.json"
    p.write_text(cfg.to_json())
    return str(p)


@pytest.mark.slow  # full CLI train+eval; cli predict/prepare/preset tests stay fast
def test_cli_train_and_eval_roundtrip(tiny_config_file, tmp_path, capsys):
    model_dir = str(tmp_path / "model")
    main(["train", "--config", tiny_config_file, "--synthetic", "4",
          "--steps", "2", "--model-dir", model_dir])
    out = capsys.readouterr().out
    assert "exported EMA model" in out
    assert (Path(model_dir) / "model.msgpack").exists()

    main(["eval", "--model-dir", model_dir, "--synthetic", "3",
          "--max-images", "3"])
    out = capsys.readouterr().out
    stats = json.loads(out)
    assert "AP" in stats


def test_cli_train_prn(tiny_config_file, tmp_path, capsys):
    model_dir = str(tmp_path / "prn")
    main(["train-prn", "--config", tiny_config_file, "--synthetic", "4",
          "--steps", "2", "--model-dir", model_dir])
    assert (Path(model_dir) / "prn.msgpack").exists()


def test_cli_predict_writes_visualization(tiny_config_file, tmp_path,
                                          capsys):
    import cv2

    img_path = str(tmp_path / "in.png")
    out_path = str(tmp_path / "out.png")
    cv2.imwrite(img_path, np.random.RandomState(0).randint(
        0, 255, (80, 96, 3), dtype=np.uint8))
    main(["predict", "--config", tiny_config_file, "--image", img_path,
          "--output", out_path])
    out = capsys.readouterr().out
    people = json.loads(out)
    assert isinstance(people, list)
    assert Path(out_path).exists()
    vis = cv2.imread(out_path)
    assert vis.shape == (80, 96, 3)


def test_cli_prepare_synthetic(tmp_path):
    from multiposenet_tpu.cli import main

    out = tmp_path / "shards"
    main(["prepare", "--synthetic", "3", "--output-dir", str(out),
          "--shard-size", "2", "--max-persons", "6"])
    from multiposenet_tpu.data.prepare import read_shards

    records = list(read_shards(out))
    assert len(records) == 3
    assert records[0]["image"].shape[-1] == 3


def test_crowd_preset_roundtrip_and_knobs():
    """Config.crowd(): the measured crowd knobs are on, it differs from
    fast() only where documented, and it JSON round-trips."""
    from multiposenet_tpu.config import Config

    c = Config.crowd()
    f = Config.fast()
    assert c.detector.box_loss == "giou"
    assert c.detector.soft_nms_sigma == 0.5
    assert c.detector.nms_vote_iou == 0.75
    assert c.detector.max_detections == 12
    assert c.detector.iou_head          # round-5 ship (NOTES_r5.md A/B)
    assert c.detector.iou_score_power == 2.0
    assert c.prn.crop_margin == 0.1
    assert c.prn.max_persons == 12
    assert c.prn.window_jitter == 0.0  # crowd-unsafe knob stays off
    assert c.model == f.model           # same compute architecture
    assert Config.from_json(c.to_json()) == c
    hash(c)


def test_cli_preset_flag():
    """--preset selects the named operating point when no --config."""
    import argparse

    from multiposenet_tpu.cli import _load_config
    from multiposenet_tpu.config import Config

    ns = argparse.Namespace(config=None, preset="crowd")
    assert _load_config(ns) == Config.crowd()
    ns = argparse.Namespace(config=None, preset="fast")
    assert _load_config(ns) == Config.fast()
    ns = argparse.Namespace(config=None, preset=None)
    assert _load_config(ns) == Config()
