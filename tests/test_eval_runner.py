"""Integration: synthetic fixture dataset → predict → OKS eval is
deterministic (SURVEY.md §4 integration row), and a 'perfect oracle
predictor' scores AP = 1.0 through the whole runner plumbing."""

import pytest

import numpy as np

from multiposenet_tpu.config import (
    Config, DecodeConfig, DetectorConfig, ModelConfig, PRNConfig,
)
from multiposenet_tpu.data.synthetic import make_dataset
from multiposenet_tpu.eval import runner
from multiposenet_tpu.eval.oks import DetectionKP, KeypointEvaluator
from multiposenet_tpu.infer.predictor import Predictor


class OraclePredictor:
    """Returns GT as predictions — exercises runner plumbing end-to-end."""

    def __init__(self, records):
        self._by_name = {r["file_name"]: r for r in records}

    def predict(self, image):
        # Identify the record by image content hash (deterministic
        # synthetic rendering).
        for rec in self._by_name.values():
            if rec["image"].shape == image.shape and np.array_equal(
                rec["image"], image
            ):
                from multiposenet_tpu.infer.predictor import (
                    PersonPrediction,
                )

                return [
                    PersonPrediction(
                        box=rec["boxes"][i],
                        score=0.9,
                        keypoints=rec["keypoints"][i].copy(),
                    )
                    for i in range(len(rec["boxes"]))
                ]
        raise AssertionError("unknown image")


def test_oracle_predictor_scores_perfect_ap():
    records = make_dataset(4, img_h=128, img_w=128, seed=3)
    stats = runner.evaluate_predictor(OraclePredictor(records), records)
    assert stats["AP"] == 1.0
    assert stats["AR"] == 1.0


@pytest.mark.slow  # real-model determinism; oracle + batched-contract tests stay fast
def test_real_predictor_eval_is_deterministic():
    cfg = Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        ),
        detector=DetectorConfig(score_threshold=0.0, max_detections=8,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32),
        decode=DecodeConfig(max_peaks_per_channel=4),
    )
    pred = Predictor(config=cfg, image_size=128)
    records = make_dataset(3, img_h=128, img_w=128, seed=4)
    s1 = runner.evaluate_predictor(pred, records)
    s2 = runner.evaluate_predictor(pred, records)
    assert s1 == s2
    assert np.isfinite(s1["AP"]) or s1["AP"] == -1.0


def test_batched_eval_matches_contract():
    cfg = Config(
        model=ModelConfig(
            backbone_width=0.25, fpn_channels=32, head_channels=32
        ),
        detector=DetectorConfig(score_threshold=0.0, max_detections=8,
                                pre_nms_top_k=100),
        prn=PRNConfig(crop_height=14, crop_width=10, hidden_units=32),
        decode=DecodeConfig(max_peaks_per_channel=4),
    )
    pred = Predictor(config=cfg, image_size=128)
    records = make_dataset(5, img_h=120, img_w=100, seed=5)
    stats = runner.evaluate_batched(pred, records, batch_size=8)
    assert set(stats) >= {"AP", "AP50", "AP75", "AR"}
