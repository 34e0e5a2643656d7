"""Micro-experiments for decode phase-A lowering variants (scratch)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import functools, time, sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H = W = 128
NP_ = 8
NM = 8
N = 2176


def _prep(x):
    """Common NMS/masked/pmap prep (f32)."""
    neg_inf = jnp.float32(-jnp.inf)
    sm = x
    inf_row = jnp.full((1, W), neg_inf)
    inf_col = jnp.full((H, 1), neg_inf)
    up = jnp.concatenate([sm[1:], inf_row], axis=0)
    down = jnp.concatenate([inf_row, sm[:-1]], axis=0)
    vmax = jnp.maximum(sm, jnp.maximum(up, down))
    left = jnp.concatenate([vmax[:, 1:], inf_col], axis=1)
    right = jnp.concatenate([inf_col, vmax[:, :-1]], axis=1)
    m9 = jnp.maximum(vmax, jnp.maximum(left, right))
    masked = jnp.where(sm >= m9, sm, neg_inf)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    pmap = row_i * 16 + 5
    return masked, pmap


def kern_reduce(x_ref, s_ref, p_ref, *, variant):
    neg_inf = jnp.float32(-jnp.inf)
    big = H * W * 16
    for c in range(NM):
        masked, pmap = _prep(x_ref[c].astype(jnp.float32))
        ss, pp = [], []
        for _ in range(NP_):
            if variant == "keepdims":
                colmax = jnp.max(masked, axis=0, keepdims=True)
                pk = jnp.min(jnp.where(masked == colmax, pmap, big),
                             axis=0, keepdims=True)
            elif variant == "fold":
                m = masked
                while m.shape[0] > 1:
                    h2 = m.shape[0] // 2
                    m3 = m.reshape(h2, 2, W)
                    m = jnp.maximum(m3[:, 0, :], m3[:, 1, :])
                colmax = m
                q = jnp.where(masked == colmax, pmap, big)
                while q.shape[0] > 1:
                    h2 = q.shape[0] // 2
                    q3 = q.reshape(h2, 2, W)
                    q = jnp.minimum(q3[:, 0, :], q3[:, 1, :])
                pk = q
            elif variant == "foldpair":
                # Fold (value max, packed argmin) TOGETHER: carry packed
                # alongside value during the tree.
                v, q = masked, pmap
                while v.shape[0] > 1:
                    h2 = v.shape[0] // 2
                    v3 = v.reshape(h2, 2, W)
                    q3 = q.reshape(h2, 2, W)
                    a, b = v3[:, 0, :], v3[:, 1, :]
                    qa, qb = q3[:, 0, :], q3[:, 1, :]
                    take_a = (a > b) | ((a == b) & (qa < qb))
                    v = jnp.where(take_a, a, b)
                    q = jnp.where(take_a, qa, qb)
                colmax, pk = v, q
            ss.append(colmax)
            pp.append(pk)
            masked = jnp.where(pmap == pk, neg_inf, masked)
        s_ref[c] = jnp.concatenate(ss, axis=0)[:, 0]
        p_ref[c] = jnp.concatenate(pp, axis=0)[:, 0]


def run(variant):
    spec = pl.BlockSpec((NM, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NM, NP_), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    o1 = jax.ShapeDtypeStruct((N, NP_), jnp.float32)
    o2 = jax.ShapeDtypeStruct((N, NP_), jnp.int32)
    f = pl.pallas_call(
        functools.partial(kern_reduce, variant=variant),
        grid=(N // NM,),
        in_specs=[pl.BlockSpec((NM, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec),
        out_shape=(o1, o2),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, H, W).astype(np.float32)).astype(jnp.bfloat16)
    g = jax.jit(lambda x: f(x))
    out = g(x); np.asarray(out[0].ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            out = g(x)
        np.asarray(out[0].ravel()[:1])
        ts.append((time.perf_counter() - t0) / 20)
    print(f"{variant:10s}: {min(ts)*1e3:.2f} ms")


for v in sys.argv[1:] or ["keepdims", "fold", "foldpair"]:
    run(v)
