import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import make_predictor, _fence
from multiposenet_tpu.ops.image import normalize
from multiposenet_tpu.ops.decode_pallas import decode_heatmaps_pallas
from multiposenet_tpu.ops.detection import postprocess_detections
from multiposenet_tpu.ops import prn_ops

pred = make_predictor(512)
cfg = pred.config
rng = np.random.RandomState(0)
bs = 32
batch = jax.device_put(jnp.asarray(rng.randint(0,255,(bs,512,512,3),dtype=np.uint8)))

def timeit(f, n=10):
    out = f(); _fence(out)
    t0=time.perf_counter()
    for _ in range(n): out = f()
    _fence(out)
    return (time.perf_counter()-t0)/n*1e3

# stage 1: forward only
fwd = jax.jit(lambda v, im: pred.model.apply(v, normalize(im), train=False))
out = fwd(pred.variables, batch)
hm = jax.device_put(out["heatmaps"])
det_out = {k: {kk: jax.device_put(vv) for kk, vv in v.items()} for k, v in out["detector"].items()}
print("forward(bf16): %.1f ms" % timeit(lambda: fwd(pred.variables, batch)), flush=True)

dec = jax.jit(lambda h: decode_heatmaps_pallas(h, cfg.decode))
print("pallas decode: %.1f ms" % timeit(lambda: dec(hm)), flush=True)

post = jax.jit(lambda d: postprocess_detections(d, 512, cfg.detector))
dets = post(det_out)
print("detection post (topk+NMS): %.1f ms" % timeit(lambda: post(det_out)), flush=True)

boxes = jax.device_put(dets.boxes / 4.0)
def prn_stage(hm, boxes):
    crops = prn_ops.batched_crop_heatmaps(hm, boxes, cfg.prn.crop_height, cfg.prn.crop_width)
    b, d = crops.shape[:2]
    flat = crops.reshape(b*d, *crops.shape[2:])
    o = pred.prn.apply(pred.prn_variables, flat)
    return prn_ops.keypoints_from_prn(o, flat, boxes.reshape(b*d,4))
prnf = jax.jit(prn_stage)
print("prn crop+mlp+readout: %.1f ms" % timeit(lambda: prnf(hm, boxes)), flush=True)

full = jax.jit(pred._batch_forward_impl)
print("FULL pipeline: %.1f ms" % timeit(lambda: full(pred.variables, pred.prn_variables, batch)), flush=True)
