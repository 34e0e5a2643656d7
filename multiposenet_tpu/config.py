"""Frozen-dataclass configuration for the whole framework.

The reference keeps hyperparameters in a single params dict / config.json
passed to tf.estimator (SURVEY.md §2 "Config" row, §5 "Config / flag
system"). We use typed frozen dataclasses instead — hashable, so they can be
closed over by jitted functions as static configuration without retracing
surprises, and self-documenting.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone + FPN + keypoint subnet (SURVEY.md §2 rows: Backbone, FPN
    neck, Keypoint subnet)."""

    num_keypoints: int = 17
    # MobileNet-v1 style depthwise-separable backbone.
    backbone_width: float = 1.0
    min_backbone_channels: int = 8
    # FPN lateral/common width (SURVEY.md: 64–128ch; we use 128 — one full
    # TPU lane register, keeps every 1x1 conv MXU-aligned).
    fpn_channels: int = 128
    # Keypoint subnet per-level conv channels.
    head_channels: int = 128
    # Convs per keypoint-subnet level tower. The reference's exact count is
    # unrecoverable (SURVEY.md §0); 2 matches the paper's description, 1 is
    # the TPU-fast operating point (Config.fast()) — the P2-level towers at
    # 128^2 dominate head FLOPs.
    kp_head_convs: int = 2
    # Heatmap output stride relative to the input image.
    output_stride: int = 4
    # Emit an auxiliary 1-channel person segmentation output (PAPER §3.2).
    with_segmentation: bool = True
    # BatchNorm hyperparameters (tracked for TF-parity; SURVEY.md §7 hard
    # part 3 — one documented convention).
    bn_momentum: float = 0.997
    bn_epsilon: float = 1e-3
    # Compute dtype for inference ("bfloat16" on TPU, "float32" for parity
    # tests). Parameters always live in float32.
    compute_dtype: str = "float32"
    # Inference-only: BatchNorm folded into conv kernel+bias (the
    # reference's freeze-graph pass; see infer/folding.py). A bn_folded
    # model consumes the tree produced by fold_batch_norm and cannot train.
    bn_folded: bool = False
    # Compute the stem 3x3/s2 conv as a 2x2 conv over the 2x2
    # space-to-depth input — EXACT same arithmetic, same param tree, ~5x
    # faster on TPU (XLA's C_in=3 conv lowering is the single most
    # expensive op in the whole model otherwise). Auto-falls back to the
    # plain conv for odd input sizes.
    s2d_stem: bool = True
    # Keypoint towers consume the smoothed pyramid (P2..P5). When False
    # they consume the raw top-down maps (T2..T5) instead — the towers'
    # first conv subsumes the smoothing conv — which skips smooth_P2
    # entirely (a 3x3 128-ch conv at 128², ~4.5 ms/iter at bs=128, that
    # only the keypoint path reads). The detector always sees smoothed
    # P3..P7. Config.fast() sets False.
    kp_smooth_pyramid: bool = True
    # Stem stride: 2 = the faithful MobileNet-v1 3x3/s2 stem; 4 = a
    # 4x4/s4 stem computed as ONE dense matmul over double
    # space-to-depth cells (models/mobilenet._S4StemConv) with block_1's
    # stride dropped so C2..C5 keep their strides. Removes the whole
    # 256²-at-512² stage (~24 MB/image of HBM traffic). Config.fast()
    # sets 4; quality cost measured on the 512² synthetic benchmark.
    stem_stride: int = 2
    # Keypoint towers + fuse conv run at stride 8; stride 4 sees only the
    # final upsample-add + output conv (see models/keypoint_head.py
    # p2_late). Config.fast() sets True.
    kp_p2_late: bool = False
    # Keep the keypoint head's 3x3 fuse conv (see keypoint_head.py).
    kp_fuse_conv: bool = True
    # Cap on backbone channel widths (0 = uncapped). The MobileNet tail
    # (five 512-ch blocks at stride 16, 1024-ch at stride 32) is sized for
    # ImageNet classification; for dense pose heads the FPN laterals
    # project everything to fpn_channels anyway, so capping the tail
    # trades HBM traffic for capacity measured on the synthetic benchmark.
    backbone_max_channels: int = 0
    # Inference-only: emit the channel-major heatmap output via the fused
    # Pallas stride-4 tail kernel (upsample-add + 3x3 output conv +
    # channel-major write in one VMEM pass — ops/kp_tail_pallas.py).
    # Active only on the merged kp_p2_late path with train=False on a TPU
    # backend; everywhere else the jnp path runs. Measured e2e on v5e
    # before shipping as a Config.fast() default (README lever table).
    kp_tail_pallas: bool = False
    # Per-stage channel caps by output stride (stride 4, 8, 16, 32); 0 =
    # no per-stage cap (backbone_max_channels still applies). The
    # stride-4 stage is pure HBM traffic at 512² inputs — capping it at
    # the FPN width (64) measured −1.6 ms/iter at bs=128 with quality
    # evidence in the README 512² table. Applied after backbone_width.
    backbone_stage_caps: tuple[int, int, int, int] = (0, 0, 0, 0)
    # Fold the per-channel input normalization (x/255 - mean)/std into the
    # stem conv kernel + a bias (both linear, so the composition is exact;
    # the model then consumes RAW 0-255 pixels). Deviation: the conv's
    # SAME zero padding pads raw-black instead of normalized-zero, so the
    # outermost stem output ring (2 input px) differs from the unfolded
    # path — out-of-image content is arbitrary either way. Saves the
    # full-lane normalize pass + retiles the uint8 (not bf16) staging
    # tensor (~1.3 ms/iter at bs=128). Config.fast() sets True.
    fold_input_norm: bool = False


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """RetinaNet-style single-class person detector head (SURVEY.md §2
    "Person detector head" row; PAPER §3.1)."""

    # FPN levels used for detection anchors (strides 8..128).
    min_level: int = 3
    max_level: int = 7
    num_scales: int = 3
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base_scale: float = 4.0
    head_channels: int = 128
    num_convs: int = 4
    # Focal loss.
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Box regression loss weight.
    box_loss_weight: float = 50.0
    # Pose-level OKS NMS after the PRN (ops/pose_nms.py): > 0 suppresses
    # detections whose keypoints duplicate a higher-scoring detection's
    # (OKS above this threshold, evaluator convention). The dedup
    # complement to soft-NMS: decayed duplicate BOXES snap to the same
    # peaks and become duplicate POSES. 0 = off (reference behavior).
    pose_nms_oks: float = 0.0
    # Gaussian soft-NMS (Bodla et al. 2017): sigma > 0 replaces hard
    # suppression with exp(-IoU²/σ) score decay, keeping genuinely-
    # overlapping people alive in crowds (nms_iou_threshold is unused in
    # that mode). 0 = the reference's hard greedy NMS. Inference-graph
    # knob; sweep in benchmarks/ab/crowd_nms_ab.py.
    soft_nms_sigma: float = 0.0
    # Box regression loss form: "huber" (per-coordinate Huber on anchor
    # deltas — the RetinaNet/reference form) or "giou" (1 - GIoU on
    # DECODED boxes — optimizes the overlap NMS and the evaluator
    # actually score). Training-time knob; giou uses giou_loss_weight
    # in place of box_loss_weight (different natural scale: 1-GIoU is
    # O(1) while Huber on deltas is O(delta^2)).
    box_loss: str = "huber"
    giou_loss_weight: float = 2.0
    # IoU-aware scoring head (round-4 knob, default OFF): one extra A-ch
    # conv on the box tower predicts each anchor's localization quality
    # (IoU of its decoded box vs the matched GT, BCE on positives); at
    # inference the NMS ranking score becomes
    # sigmoid(cls) * sigmoid(iou)^iou_score_power, so the best-LOCALIZED
    # box wins NMS instead of the most-confident one. Motivated by the
    # round-4 error attribution: ~36% of crowd GT is lost to box quality
    # (poor_box 0.20 + bad_kps at mean match IoU 0.60 — NOTES_r4.md);
    # A/B: benchmarks/ab/iou_head_ab.py. Structural knob: changes the
    # param tree (checkpoint format) when enabled.
    iou_head: bool = False
    iou_loss_weight: float = 1.0
    iou_score_power: float = 1.0
    # Matching thresholds for anchor assignment.
    match_high: float = 0.5
    match_low: float = 0.4
    # Inference-time decoding (fixed shapes — XLA friendly).
    pre_nms_top_k: int = 512
    # Use jax.lax.approx_max_k for the pre-NMS candidate pool (2x faster
    # than exact top_k on TPU; recall_target 0.95 per bucket). The pool
    # only seeds NMS for max_detections=20 outputs, so approximate
    # membership at the pool tail is quality-neutral.
    approx_top_k: bool = True
    # 20 = COCOeval keypoints maxDets; every padded slot costs PRN work.
    max_detections: int = 20
    nms_iou_threshold: float = 0.5
    # Box voting (ops/nms.py): replace each NMS winner with the
    # score-weighted average of live candidates at IoU ≥ this value.
    # 0 = plain greedy NMS (the reference's behavior). Inference-graph
    # knob — no retraining needed to flip.
    nms_vote_iou: float = 0.0
    # COCO AP is ranking-based — candidates are never thresholded away in
    # the evaluator, so a high default floor only costs recall (the focal
    # prior starts sigmoid scores at ~0.01 and calibration grows slowly
    # during training). 0.05 is the RetinaNet-standard eval floor;
    # interactive predict() users can raise it per call site.
    score_threshold: float = 0.05


@dataclasses.dataclass(frozen=True)
class PRNConfig:
    """Pose Residual Network (SURVEY.md §2 "PRN" row; PAPER §3.3): crop the
    17ch heatmap inside each person box, resize to a fixed grid, 1 hidden FC
    with residual add, per-channel spatial softmax."""

    # Fixed crop grid (PAPER: height 56 x width 36).
    crop_height: int = 56
    crop_width: int = 36
    hidden_units: int = 1024
    # Static max persons per image — dynamic person count is padded to this
    # with validity masks (SURVEY.md §7 hard part 2).
    max_persons: int = 32
    # Sub-pixel readout: snap each PRN argmax cell center to the nearest
    # decoded heatmap peak within this many crop-cell pitches (the decode
    # kernel's peaks carry quarter-pixel refinement; SURVEY.md §3.4).
    # 0 disables snapping (pure cell-center readout).
    snap_radius_cells: float = 1.0
    # Expand person boxes by this fraction of each side before the PRN
    # crop (inference AND PRN training — ops/prn_ops.expand_boxes). The
    # reference crops the box exactly; with detector (not GT) boxes a
    # margin keeps edge keypoints in the PRN's view. 0 = reference
    # behavior.
    crop_margin: float = 0.0
    # PRN training-time window jitter: each edge of the GT box moves by
    # Uniform(±jitter × side_length) before the crop (train/prn_train.py).
    # The reference trains the PRN on exact GT windows; at inference it
    # sees noisy detector windows — jitter closes that train/test window
    # mismatch. 0 = reference behavior.
    window_jitter: float = 0.0


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Heatmap decoding (SURVEY.md §3.4 DECODE block): Gaussian smoothing →
    peak NMS → channelwise top-k → sub-pixel refinement."""

    # Gaussian smoothing kernel (reference uses scipy.ndimage.gaussian_filter).
    smooth_sigma: float = 1.0
    smooth_kernel_size: int = 7
    # Peak NMS window (maximum_filter footprint).
    nms_window: int = 3
    # Per-channel candidate peaks kept.
    max_peaks_per_channel: int = 8
    # Minimum peak score.
    score_threshold: float = 0.2
    # Sub-pixel shift magnitude toward the larger neighbor (¼ px).
    subpixel_shift: float = 0.25


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training harness (SURVEY.md §2 "Training harness" row)."""

    image_size: int = 512
    batch_size: int = 64
    num_steps: int = 150_000
    learning_rate: float = 1e-3
    end_learning_rate: float = 1e-5
    warmup_steps: int = 1_000
    weight_decay: float = 1e-5
    ema_decay: float = 0.999  # eval/export uses EMA weights (author invariant)
    gradient_clip_norm: float = 10.0
    # Loss weights.
    heatmap_loss_weight: float = 1.0
    segmentation_loss_weight: float = 1.0
    detector_loss_weight: float = 1.0
    # Checkpointing (Orbax).
    checkpoint_dir: str = "/tmp/multiposenet_tpu/checkpoints"
    save_interval_steps: int = 1_000
    max_to_keep: int = 3
    log_interval_steps: int = 100
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh (SURVEY.md §5 "Distributed communication backend"): a 1-D
    'data' mesh; DP is the only strategy meaningful for a ~5M-param CNN at
    512x512. The mesh abstraction is the extension point for DCN scales."""

    data_axis: str = "data"


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    detector: DetectorConfig = DetectorConfig()
    prn: PRNConfig = PRNConfig()
    decode: DecodeConfig = DecodeConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def fast(cls, **overrides: Any) -> "Config":
        """The benchmarked TPU operating point (see README perf notes).

        Same architecture family as the defaults, with the head/PRN widths
        chosen for v5e throughput: 1-conv keypoint towers, 2-conv 64-ch
        detector towers, PRN hidden 512, bf16 compute. The reference's
        exact head widths are unrecoverable (SURVEY.md §0), so both
        operating points are first-class; quality evidence
        (benchmarks/train_synthetic_demo.py, tests/test_integration_ap.py)
        runs on THIS config.
        """
        cfg = cls(
            model=ModelConfig(compute_dtype="bfloat16", kp_head_convs=1,
                              kp_smooth_pyramid=False, head_channels=64,
                              fpn_channels=64, fold_input_norm=True,
                              # Round-3 structural levers, each measured
                              # at bs=128/512² on v5e (NOTES_r3.md):
                              # stride-8 keypoint head (-3.2 ms/iter),
                              # matmul s4 stem killing the 256² stage
                              # (-3.1), backbone tail trim (-4.0),
                              # width 0.75 (-1.8); quality at THIS
                              # operating point: README 512² table.
                              kp_p2_late=True, stem_stride=4,
                              backbone_max_channels=256,
                              backbone_width=0.75,
                              # Stage caps (r3): stride-4 stage at 48ch,
                              # C3 stage at 128 — 18.95 -> 16.16 ms/iter
                              # same-process; quality at 512² IMPROVED
                              # over the uncapped trim (e2e AP 0.695 vs
                              # 0.666 pool-128 — README table). C4 cap
                              # at 192 measured WORSE (bad lane
                              # multiple); C4/C5 keep max_channels=256.
                              backbone_stage_caps=(48, 128, 0, 0),
                              # fuse conv dropped: towers + output conv
                              # are the mixing (−0.6 ms/iter measured).
                              kp_fuse_conv=False),
            # 1-conv detector towers: −0.8 ms/iter measured; detector AP
            # validated by the 512² quality run (README table).
            # pre_nms_top_k=128: the pool only seeds NMS for 20 outputs;
            # halving it from 256 saves ~1 ms/iter (r3 sweep) and is
            # quality-checked at 512² (README table, pool column).
            detector=DetectorConfig(num_convs=1, head_channels=64,
                                    pre_nms_top_k=128),
            # Half-pitch crop grid: with sub-pixel peak snapping the PRN
            # grid only disambiguates WHICH peak belongs to the person, so
            # 28x18 keeps accuracy while quartering PRN cost.
            prn=PRNConfig(hidden_units=512, crop_height=28, crop_width=18),
        )
        return dataclasses.replace(cfg, **overrides) if overrides else cfg

    @classmethod
    def crowd(cls, **overrides: Any) -> "Config":
        """Crowded-scene operating point: `fast()` plus the measured crowd
        knobs (NOTES_r3.md composition table, replicated on two
        independently-trained model pairs at 128²):

        - GIoU box loss (w=5): +0.08-0.10 crowd e2e AP — overlapping GTs
          punish imprecise boxes twice (PRN crop AND NMS cluster);
        - Gaussian soft-NMS σ=0.5 + box voting 0.75: +0.04-0.05 — decay
          instead of hard suppression keeps real neighbors alive;
        - PRN crop margin 0.1 (all crowd arms were measured with it;
          margins ≥0.2 measured WORSE on both seeds — NOTES_r5.md);
        - 12 detection/PRN slots (vs 9 GT max in the ≥8-person setting);
        - IoU-aware scoring head, power 2 (round-5 A/B, NOTES_r5.md):
          +0.026/+0.037 crowd e2e AP on two seeds, GT-box control flat,
          poor_box/bad_kps attribution classes both shrink — the measured
          cure for the round-4 ~36% box-quality attribution. STRUCTURAL:
          iou_head changes the detector param tree, so crowd() checkpoints
          from rounds ≤4 need `iou_head=False` passed as an override to
          restore (see README "Checkpoint compatibility").

        Composed: 5-9-person e2e AP 0.19/0.20 → 0.31/0.34 over `fast()`'s
        reference-faithful defaults (pre-iou_head numbers). NOTE:
        `window_jitter` stays 0 — it collapses the crowd GT-box protocol
        (NOTES_r3.md crowd caveat).
        """
        cfg = cls.fast()
        cfg = cfg.replace(
            detector=dataclasses.replace(
                cfg.detector, box_loss="giou", giou_loss_weight=5.0,
                soft_nms_sigma=0.5, nms_vote_iou=0.75,
                max_detections=12,
                iou_head=True, iou_loss_weight=1.0, iou_score_power=2.0),
            prn=dataclasses.replace(
                cfg.prn, crop_margin=0.1, max_persons=12),
        )
        return dataclasses.replace(cfg, **overrides) if overrides else cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        def build(dc_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {dc_cls.__name__}.{k}")
                f = fields[k]
                if dataclasses.is_dataclass(f.type) or (
                    isinstance(f.default, tuple) and isinstance(v, list)
                ):
                    v = tuple(v) if isinstance(v, list) else v
                kwargs[k] = v
            return dc_cls(**kwargs)

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            detector=build(DetectorConfig, d.get("detector", {})),
            prn=build(PRNConfig, d.get("prn", {})),
            decode=build(DecodeConfig, d.get("decode", {})),
            train=build(TrainConfig, d.get("train", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))
