"""Architecture-variant e2e throughput sweep (scratch, round 3)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import dataclasses, sys, time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiposenet_tpu.config import Config
from multiposenet_tpu.infer.predictor import Predictor
from multiposenet_tpu.ops import decode_pallas
from multiposenet_tpu.ops.image import space_to_depth_flat, space_to_depth_flat4

SIZE = 512

# Each variant: config section overrides + optional "bs" / "mpp" /
# "xfirst" / "batchedB" knobs.
# "blocks" replaces mobilenet._MOBILENET_V1_BLOCKS for the build
# (perf-only probe; a win gets a real config knob + retrain for quality
# evidence). "tap2" moves the C2 tap to that block index.
_B = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
    (1024, 1),
)
# Stride-4 stage capped at 64 ch (85*0.75 -> 64 after make_divisible).
_B_S4CAP = ((64, 1), (85, 2), (85, 1)) + _B[3:]
# block_2 dropped entirely (C2 tap moves to block_1).
_B_DROP2 = ((64, 1), (128, 2)) + _B[3:]
# + 64² (C3) stage capped at 128 (171*0.75 -> 128).
_B_CAP64_128 = ((64, 1), (85, 2), (85, 1), (171, 2), (171, 1)) + _B[5:]
# 128² stage at 48 throughout + C3 at 128.
_B_CAP48_128 = ((64, 1), (64, 2), (64, 1), (171, 2), (171, 1)) + _B[5:]
# + C4 stage capped at 192 (256*0.75).
_B_CAP64_128_192 = (
    (64, 1), (85, 2), (85, 1), (171, 2), (171, 1),
    (256, 2), (256, 1), (256, 1), (256, 1), (256, 1), (256, 1),
    (1024, 2), (1024, 1),
)

VARIANTS = {
    # Committed round-3 operating point (6613 img/s official bench):
    # merged upsample + x-first crop + batched phase-B mpp64. r3 sweep
    # history: xb32/yb32/yb16/xb48/xb64/xs16 ->
    # 19.18/20.42/20.52/19.03/18.92/19.17 ms (one process).
    "base": {},
    "bs192": {"bs": 192},
    "bs256": {"bs": 256},
    "s4cap64": {"blocks": _B_S4CAP},
    "drop2": {"blocks": _B_DROP2, "tap2": 1},
    "s4cap64_drop2": {"blocks": ((64, 1), (85, 2)) + _B[3:], "tap2": 1},
    "cap64_128": {"blocks": _B_CAP64_128},
    "cap48_128": {"blocks": _B_CAP48_128},
    "cap64_128_192": {"blocks": _B_CAP64_128_192},
    # Fused stride-4 tail kernel (upsample-add + output conv + cm write).
    "tail": {"model": {"kp_tail_pallas": True}},
    "tail32": {"model": {"kp_tail_pallas": True}, "tilerows": 32},
    "tail8": {"model": {"kp_tail_pallas": True}, "tilerows": 8},
    # Quality knobs' perf cost (128² CPU A/B: vote 0.75 +0.011 AP,
    # margin 0.1 +0.017 AP — NOTES_r3.md).
    "vote": {"detector": {"nms_vote_iou": 0.75},
             "prn": {"crop_margin": 0.1}},
    "tailvote": {"model": {"kp_tail_pallas": True},
                 "detector": {"nms_vote_iou": 0.75},
                 "prn": {"crop_margin": 0.1}},
    # Config.crowd()'s exact inference graph (soft-NMS + vote + margin +
    # 12 person slots; giou is train-only) — the preset's README
    # throughput claim.
    "crowdpreset": {"detector": {"soft_nms_sigma": 0.5,
                                 "nms_vote_iou": 0.75,
                                 "max_detections": 12},
                    "prn": {"crop_margin": 0.1, "max_persons": 12}},
    # crowd + pose-NMS (ops/pose_nms.py): the dedup knob's perf cost.
    "crowdposenms": {"detector": {"soft_nms_sigma": 0.5,
                                  "nms_vote_iou": 0.75,
                                  "max_detections": 12,
                                  "pose_nms_oks": 0.9},
                     "prn": {"crop_margin": 0.1, "max_persons": 12}},
    # crowd + iou_head at the measured-best power 2 (round-5 crowd A/B:
    # +0.026/+0.037 e2e AP two seeds): the knob's inference perf cost —
    # one extra A-channel conv per level + the NMS rescore.
    "crowdiouh": {"detector": {"soft_nms_sigma": 0.5,
                               "nms_vote_iou": 0.75,
                               "max_detections": 12,
                               "iou_head": True,
                               "iou_score_power": 2.0},
                  "prn": {"crop_margin": 0.1, "max_persons": 12}},
    # Round-5 micro-lever A/Bs (profile-driven, NOTES_r5.md):
    # PRN score readout via take_along_axis (the pre-round-5 path;
    # base now ships the one-hot select-and-reduce).
    "scoregather": {"scoreonehot": False},
    # PRN crop emitting [P,K,cw,ch] in dot_general-native order (free
    # contiguous flatten) vs the shipped crop_cm + to_channel_major pair
    # (materialized 0.64 ms transpose at bs=128 — NOTES_r5 profile).
    "kmnative": {"kmnative": True},
    # Hard-NMS parallel fixpoint (exact greedy equivalence, ~3 rounds vs
    # 20 sequential picks — ops/nms.py HARD_FIXPOINT).
    "nmsfix": {"nmsfix": True},
    # Both round-5c levers together.
    "kmnmsfix": {"kmnative": True, "nmsfix": True},
    # Maps-on-lanes Pallas decode (zero relayout copy at the custom-call
    # boundary — decode_pallas.DECODE_LANES), alone and with nmsfix.
    "lanes": {"lanes": True},
    "lanes64": {"lanes": True, "lanesblk": 64},
    "lanesnmsfix": {"lanes": True, "nmsfix": True},
    # Transposed s4-flat staging (space_to_depth_flat4_t): host
    # pre-applies the {0,2,1} relayout so copy.282 (0.43 ms) becomes a
    # bitcast. Shape-dispatched in the predictor — no model flag.
    "staget": {"staget": True},
    # Request the staged-input parameter in the layout the stem wants
    # (minor-to-major {0,2,1} per the profile's 0.42 ms relayout
    # copy.300) so the copy moves into device_put/H2D.
    "informat": {"informat": (1, 2, 0)},
}


def build(overrides):
    cfg = Config.fast()
    for section, kv in overrides.items():
        if section in ("bs", "mpp", "pred", "xfirst", "batchedB",
                       "blocks", "tap2", "tilerows", "scoreonehot",
                       "informat", "kmnative", "nmsfix", "lanes", "lanesblk",
                       "staget"):
            continue
        cfg = cfg.replace(**{
            section: dataclasses.replace(getattr(cfg, section), **kv)
        })
    return cfg


def bench(name):
    from multiposenet_tpu.models import mobilenet
    from multiposenet_tpu.ops import kp_tail_pallas, prn_ops
    spec = VARIANTS[name]
    bs = spec.get("bs", 128)
    mpp0 = decode_pallas.MAPS_PER_PROGRAM
    xf0 = prn_ops.CROP_X_FIRST
    so0 = prn_ops.SCORE_ONEHOT
    km0 = prn_ops.CROP_KM_NATIVE
    from multiposenet_tpu.ops import nms as nms_mod
    nf0 = nms_mod.HARD_FIXPOINT
    ln0 = decode_pallas.DECODE_LANES
    lb0 = decode_pallas.MAPS_LANES_BLOCK
    bb0 = decode_pallas.BATCHED_PHASE_B
    tr0 = kp_tail_pallas.TILE_ROWS
    blocks0 = mobilenet._MOBILENET_V1_BLOCKS
    taps0 = mobilenet._TAP_AFTER
    decode_pallas.MAPS_PER_PROGRAM = spec.get("mpp", mpp0)
    prn_ops.CROP_X_FIRST = spec.get("xfirst", xf0)
    prn_ops.SCORE_ONEHOT = spec.get("scoreonehot", so0)
    prn_ops.CROP_KM_NATIVE = spec.get("kmnative", km0)
    nms_mod.HARD_FIXPOINT = spec.get("nmsfix", nf0)
    decode_pallas.DECODE_LANES = spec.get("lanes", ln0)
    decode_pallas.MAPS_LANES_BLOCK = spec.get("lanesblk", lb0)
    decode_pallas.BATCHED_PHASE_B = spec.get("batchedB", bb0)
    kp_tail_pallas.TILE_ROWS = spec.get("tilerows", tr0)
    if "blocks" in spec:
        mobilenet._MOBILENET_V1_BLOCKS = spec["blocks"]
        if "tap2" in spec:
            taps = {k - 1 if k > spec["tap2"] else k: v
                    for k, v in taps0.items()}
            taps[spec["tap2"]] = "C2"
            mobilenet._TAP_AFTER = taps
    try:
        cfg = build(spec)
        pred = Predictor(config=cfg, image_size=SIZE,
                         **spec.get("pred", {}))
        stage = (space_to_depth_flat4 if cfg.model.stem_stride == 4
                 else space_to_depth_flat)
        if spec.get("staget"):
            from multiposenet_tpu.ops.image import space_to_depth_flat4_t
            stage = space_to_depth_flat4_t
        rng = np.random.RandomState(0)
        if "informat" in spec:
            from jax.experimental.layout import Format, Layout
            fmt = Format(
                Layout(spec["informat"]),
                jax.sharding.SingleDeviceSharding(jax.devices()[0]),
            )
            put = lambda a: jax.device_put(jnp.asarray(a), fmt)
            fn = jax.jit(pred._batch_forward_impl,
                         in_shardings=(None, None, fmt))
        else:
            put = jax.device_put
            fn = jax.jit(pred._batch_forward_impl)
        bufs = [
            put(jnp.asarray(stage(rng.randint(
                0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))))
            for _ in range(2)
        ]
        out = fn(pred.variables, pred.prn_variables, bufs[0])
        np.asarray(out["keypoints"].ravel()[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(10):
                out = fn(pred.variables, pred.prn_variables, bufs[i % 2])
            np.asarray(out["keypoints"].ravel()[:1])
            ts.append((time.perf_counter() - t0) / 10)
        sec = sorted(ts)[1]
        print(f"{name:24s}: {sec*1e3:7.2f} ms/iter  {bs/sec:7.0f} img/s",
              flush=True)
    finally:
        decode_pallas.MAPS_PER_PROGRAM = mpp0
        prn_ops.CROP_X_FIRST = xf0
        prn_ops.SCORE_ONEHOT = so0
        prn_ops.CROP_KM_NATIVE = km0
        nms_mod.HARD_FIXPOINT = nf0
        decode_pallas.DECODE_LANES = ln0
        decode_pallas.MAPS_LANES_BLOCK = lb0
        decode_pallas.BATCHED_PHASE_B = bb0
        kp_tail_pallas.TILE_ROWS = tr0
        mobilenet._MOBILENET_V1_BLOCKS = blocks0
        mobilenet._TAP_AFTER = taps0


if __name__ == "__main__":
    for name in (sys.argv[1:] or list(VARIANTS)):
        bench(name)


def bench_unroll2(bs: int = 128, caps=None):
    """Two full iterations inlined in ONE jitted program (separate args,
    no stacking/slicing — unlike the pruned lax.map scan) to amortize the
    per-dispatch tunnel overhead (wall ~19 vs device-op ~16.5 ms)."""
    import dataclasses as _dc
    cfg = Config.fast()
    if caps:
        cfg = cfg.replace(model=_dc.replace(
            cfg.model, backbone_stage_caps=tuple(caps)))
    pred = Predictor(config=cfg, image_size=SIZE)
    stage = (space_to_depth_flat4 if cfg.model.stem_stride == 4
             else space_to_depth_flat)
    rng = np.random.RandomState(0)
    bufs = [
        jax.device_put(jnp.asarray(stage(rng.randint(
            0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))))
        for _ in range(4)
    ]

    def two(variables, prn_variables, im1, im2):
        return (pred._batch_forward_impl(variables, prn_variables, im1),
                pred._batch_forward_impl(variables, prn_variables, im2))

    fn = jax.jit(two)
    out = fn(pred.variables, pred.prn_variables, bufs[0], bufs[1])
    np.asarray(out[1]["keypoints"].ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            out = fn(pred.variables, pred.prn_variables,
                     bufs[(2 * i) % 4], bufs[(2 * i + 1) % 4])
        np.asarray(out[1]["keypoints"].ravel()[:1])
        ts.append((time.perf_counter() - t0) / 10)
    sec = sorted(ts)[1]
    print(f"unroll2 bs={bs} caps={caps}: {sec*1e3:7.2f} ms/iter  "
          f"{bs/sec:7.0f} img/s", flush=True)


def bench_scan(n_chunks: int, bs: int = 128):
    """One dispatch per n_chunks microbatches via lax.map — amortizes the
    per-execute host/tunnel overhead (wall 25.8 vs device-op 23.2 ms)."""
    cfg = Config.fast()
    pred = Predictor(config=cfg, image_size=SIZE)
    stage = (space_to_depth_flat4 if cfg.model.stem_stride == 4
             else space_to_depth_flat)
    rng = np.random.RandomState(0)
    bufs = [
        jax.device_put(jnp.asarray(np.stack([
            stage(rng.randint(0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))
            for _ in range(n_chunks)
        ])))
        for _ in range(2)
    ]

    def multi(variables, prn_variables, images):
        return jax.lax.map(
            lambda im: pred._batch_forward_impl(variables, prn_variables, im),
            images)

    fn = jax.jit(multi)
    out = fn(pred.variables, pred.prn_variables, bufs[0])
    np.asarray(out["keypoints"].ravel()[:1])
    n_iter = max(1, 10 // n_chunks)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = fn(pred.variables, pred.prn_variables, bufs[i % 2])
        np.asarray(out["keypoints"].ravel()[:1])
        ts.append((time.perf_counter() - t0) / (n_iter * n_chunks))
    sec = sorted(ts)[1]
    print(f"scan{n_chunks:2d}x{bs:3d}            : {sec*1e3:7.2f} ms/128  "
          f"{bs/sec:7.0f} img/s", flush=True)
