"""Standalone TPU compile+parity probe for ops/kp_tail_pallas.

The fused tail kernel passes CPU interpret-mode parity but its original
5-D nearest-upsample broadcast was an unsupported Mosaic shape cast on
real TPU (round-5 probe — NOTES_r5.md). This script compiles the kernel
alone (fast cycle vs the full-model abench), checks numerics against
the jnp reference at the in-model shapes, and times it standalone.

Usage: JAX_PLATFORMS=axon python benchmarks/ab/kp_tail_probe.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multiposenet_tpu.ops import kp_tail_pallas


def reference(l2, z8, kernel, bias):
    up = jnp.repeat(jnp.repeat(z8, 2, axis=1), 2, axis=2)
    x = l2 + up
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    return jnp.transpose(y, (0, 3, 1, 2)).astype(l2.dtype)


def main() -> None:
    b, h, w, c, k = 8, 128, 128, 64, 17
    rng = np.random.RandomState(0)
    l2 = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    z8 = jnp.asarray(rng.randn(b, h // 2, w // 2, c), jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(3, 3, c, k) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(k), jnp.float32)

    t0 = time.time()
    fn = jax.jit(kp_tail_pallas.kp_tail_cm)
    out = np.asarray(fn(l2, z8, kernel, bias))
    print(f"# compiled+ran in {time.time() - t0:.1f}s", flush=True)

    ref = np.asarray(jax.jit(reference)(l2, z8, kernel, bias))
    err = np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f"max_abs_err={err:.4f} rel={rel:.5f}")
    assert rel < 2e-2, "kernel vs conv reference mismatch"

    for name, f in (("kernel", fn), ("xla_ref", jax.jit(reference))):
        f(l2, z8, kernel, bias)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = f(l2, z8, kernel, bias)
            np.asarray(out).ravel()[:1]
            ts.append((time.perf_counter() - t0) / 20)
        print(f"{name}: {sorted(ts)[1] * 1e3:.3f} ms standalone "
              f"(bs={b})", flush=True)


if __name__ == "__main__":
    main()
