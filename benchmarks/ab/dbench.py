import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import time, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from multiposenet_tpu.config import DecodeConfig
from multiposenet_tpu.ops.decode_pallas import _decode_maps_pallas

cfg = DecodeConfig()
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(2176, 128, 128).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda x: _decode_maps_pallas(x, cfg, False))
out = f(x); np.asarray(out[0].ravel()[:1])
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(x)
    np.asarray(out[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / 20
    print(f"kernel-only: {dt*1e3:.2f} ms for 2176 maps ({2176/dt/1e3:.0f}k maps/s)")
