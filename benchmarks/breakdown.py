"""Per-stage timing breakdown of the e2e inference pipeline on the current
backend (bs=128 @512^2 bf16 by default — the headline bench shape).

Each stage is timed as its own jitted program on pre-staged device inputs
(differential ablations mis-attribute cost across fusion boundaries; whole-
subgraph timings are the honest unit here). Prints a JSON dict of
milliseconds per batch plus images/sec.

Usage: python benchmarks/breakdown.py [--batch-size 128] [--image-size 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fence(out) -> None:
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[:1])


def timeit(fn, *args, n_iters=8, n_warmup=2) -> float:
    for _ in range(n_warmup):
        out = fn(*args)
    _fence(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        _fence(out)
        times.append((time.perf_counter() - t0) / n_iters)
    return sorted(times)[1] * 1e3  # ms


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()
    bs, s = args.batch_size, args.image_size

    from bench import make_predictor

    pred = make_predictor(s, bf16=not args.fp32)
    cfg = pred.config
    rng = np.random.RandomState(0)
    imgs = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (bs, s, s, 3), dtype=np.uint8)
    ))

    from multiposenet_tpu.ops import image as image_ops
    from multiposenet_tpu.ops import prn_ops
    from multiposenet_tpu.ops.detection import postprocess_detections

    v = pred.variables
    pv = pred.prn_variables
    dtype = jnp.dtype(cfg.model.compute_dtype)

    x = jax.jit(image_ops.normalize)(imgs)
    _fence(x)

    from multiposenet_tpu.models.fpn import FPN
    from multiposenet_tpu.models.mobilenet import MobileNetV1

    bb_mod = MobileNetV1(
        width=cfg.model.backbone_width,
        min_channels=cfg.model.min_backbone_channels,
        bn_momentum=cfg.model.bn_momentum,
        bn_epsilon=cfg.model.bn_epsilon,
        bn_folded=cfg.model.bn_folded,
        dtype=dtype,
    )
    fpn_mod = FPN(channels=cfg.model.fpn_channels, with_p6_p7=True,
                  dtype=dtype)

    def _sub(tree, key):
        return {k: t[key] for k, t in tree.items() if key in t}

    bb_vars = _sub(v, "backbone")
    fpn_vars = _sub(v, "fpn")

    def backbone(bb_vars, x):
        return bb_mod.apply(bb_vars, x, train=False)

    def backbone_fpn(bb_vars, fpn_vars, x):
        return fpn_mod.apply(
            fpn_vars, bb_mod.apply(bb_vars, x, train=False), train=False
        )

    def full_fwd(v, x):
        return pred.model.apply(v, x, train=False)

    out = jax.jit(full_fwd)(v, x)
    _fence(out)
    hm = out["heatmaps"]

    def decode_only(hm):
        return pred._decode(hm).scores

    def postproc(det_out):
        return postprocess_detections(det_out, s, cfg.detector).boxes

    det = jax.jit(postproc)(out["detector"])
    _fence(det)
    detections = postprocess_detections(out["detector"], s, cfg.detector)
    hm_boxes = detections.boxes / float(cfg.model.output_stride)
    hm_boxes = jax.device_put(hm_boxes)

    def crops_fn(hm, hm_boxes):
        return prn_ops.batched_crop_heatmaps(
            hm, hm_boxes, cfg.prn.crop_height, cfg.prn.crop_width, dtype
        )

    crops = jax.jit(crops_fn)(hm, hm_boxes)
    _fence(crops)
    b, d = crops.shape[:2]
    flat = prn_ops.to_channel_major(crops, 17)

    def prn_mlp(pv, flat):
        return pred.prn.apply(pv, flat, return_logits=True)

    prn_out = jax.jit(prn_mlp)(pv, flat)
    _fence(prn_out)

    def prn_readout(prn_out, flat, hm_boxes):
        return prn_ops.keypoints_from_prn(
            prn_out, flat, hm_boxes.reshape(b * d, 4),
            cfg.prn.crop_height, cfg.prn.crop_width,
        )

    stages = {
        "normalize": timeit(jax.jit(image_ops.normalize), imgs),
        "backbone": timeit(jax.jit(backbone), bb_vars, x),
        "backbone_fpn": timeit(jax.jit(backbone_fpn), bb_vars, fpn_vars,
                               x),
        "forward_all_heads": timeit(jax.jit(full_fwd), v, x),
        "decode": timeit(jax.jit(decode_only), hm),
        "det_postprocess_nms": timeit(jax.jit(postproc), out["detector"]),
        "prn_crops": timeit(jax.jit(crops_fn), hm, hm_boxes),
        "prn_mlp": timeit(jax.jit(prn_mlp), pv, flat),
        "prn_readout": timeit(jax.jit(prn_readout), prn_out, flat,
                              hm_boxes),
        "e2e_batch": timeit(jax.jit(pred._batch_forward_impl), v, pv,
                            imgs, n_iters=6),
    }
    stages = {k: round(ms, 2) for k, ms in stages.items()}
    stages["derived_fpn_ms"] = round(
        stages["backbone_fpn"] - stages["backbone"], 2
    )
    stages["derived_heads_ms"] = round(
        stages["forward_all_heads"] - stages["backbone_fpn"], 2
    )
    stages["images_per_sec"] = round(bs / (stages["e2e_batch"] / 1e3), 1)
    stages["batch_size"] = bs
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
