"""Export-time BatchNorm folding (the reference's freeze-graph pass).

Reference counterpart: freezing to .pb bakes BN into conv weights
(SURVEY.md §2 "Export" row). At inference BN is the affine
    y = (conv(x) - mean) * gamma / sqrt(var + eps) + beta
which folds into the convolution:
    kernel' = kernel * s        (s = gamma / sqrt(var + eps), per out-chan)
    bias'   = beta - mean * s

`fold_batch_norm` rewrites a trained variables tree {params, batch_stats}
into the param tree of the SAME model built with
`ModelConfig(bn_folded=True)` — whose ConvBNRelu6 blocks declare
conv(kernel, bias) and no BN. Besides removing ~27 elementwise passes,
folding lets the Pallas depthwise kernel fuse bias+ReLU6 in-kernel,
recovering the fusion XLA loses around custom calls.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _fold_one(conv: dict, bn_params: dict, bn_stats: dict,
              epsilon: float) -> dict:
    kernel = np.asarray(conv["kernel"], np.float32)
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    s = gamma / np.sqrt(var + epsilon)
    return {
        "kernel": jnp.asarray(kernel * s),  # broadcast over out-channels
        "bias": jnp.asarray(beta - mean * s),
    }


def fold_batch_norm(
    variables: Any, epsilon: float = 1e-3
) -> dict:
    """{params, batch_stats} → folded {params} for the bn_folded model.

    Walks the tree; every module that contains both a 'conv' (or the
    depthwise param layout) and a 'bn' sibling is folded; everything else
    passes through unchanged.
    """
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    def walk(p: Any, s: Any) -> Any:
        if not isinstance(p, dict):
            return p
        if "conv" in p and "bn" in p and isinstance(s, dict) and "bn" in s:
            folded = dict(p)
            folded["conv"] = _fold_one(p["conv"], p["bn"], s["bn"],
                                       epsilon)
            del folded["bn"]
            return folded
        return {
            k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
            for k, v in p.items()
        }

    return {"params": walk(params, stats)}
