"""Model export/import: serialized EMA weights + config, and a TF-checkpoint
import path.

Reference counterpart: `save.py` / `create_pb.py` — freeze the trained graph
with EMA weights baked in (SURVEY.md §2 "Export" row). The XLA-native
equivalent of a frozen graph is (config JSON + params msgpack): the jitted
program is reconstructed deterministically from those, and AOT compilation
happens at Predictor build time.

Also ships the TF→flax weight-import hook mandated by SURVEY.md §7 hard
part 6 ("provide deterministic-init path + weight-import utility (TF ckpt →
flax) for when weights appear").
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Mapping

import flax.serialization
import jax
import numpy as np

from multiposenet_tpu.config import Config


def save_model(
    directory: str | Path,
    config: Config,
    variables: Any,
    prn_variables: Any | None = None,
) -> None:
    """Export config + weights (use EMA params for parity with the
    reference's EMA-baked frozen graphs)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    (directory / "config.json").write_text(config.to_json())
    (directory / "model.msgpack").write_bytes(
        flax.serialization.to_bytes(jax.device_get(variables))
    )
    if prn_variables is not None:
        (directory / "prn.msgpack").write_bytes(
            flax.serialization.to_bytes(jax.device_get(prn_variables))
        )


def load_model(directory: str | Path):
    """Returns (config, variables, prn_variables | None)."""
    directory = Path(directory)
    config = Config.from_json((directory / "config.json").read_text())

    # Build templates with the right tree structure, then fill from bytes.
    from multiposenet_tpu.infer.predictor import Predictor

    template = Predictor(config=config, image_size=config.train.image_size)
    variables = flax.serialization.from_bytes(
        jax.device_get(template.variables),
        (directory / "model.msgpack").read_bytes(),
    )
    prn_variables = None
    prn_path = directory / "prn.msgpack"
    if prn_path.exists():
        prn_variables = flax.serialization.from_bytes(
            jax.device_get(template.prn_variables), prn_path.read_bytes()
        )
    return config, variables, prn_variables


def load_predictor(directory: str | Path, **kwargs):
    """One-call equivalent of the reference's frozen-graph loading."""
    from multiposenet_tpu.infer.predictor import Predictor

    config, variables, prn_variables = load_model(directory)
    return Predictor(
        config=config, variables=variables, prn_variables=prn_variables,
        **kwargs,
    )


def mobilenet_v1_slim_name_map(path: str) -> str | None:
    """Best-effort flax-path → TF-slim MobileNetV1 variable-name mapping.

    Covers the backbone warm start the reference used ("warm-started from
    an ImageNet ckpt", SURVEY.md §2 Backbone row). Block order matches
    slim's Conv2d_0 (stem) + Conv2d_{i}_depthwise/pointwise numbering.
    Only backbone weights map; heads keep their init. Verify shapes — the
    importer raises on mismatch.
    """
    parts = path.split("/")
    if parts[0] != "backbone":
        return None

    def bn_suffix(leaf: str) -> str | None:
        return {
            "scale": "BatchNorm/gamma",
            "bias": "BatchNorm/beta",
            "mean": "BatchNorm/moving_mean",
            "var": "BatchNorm/moving_variance",
        }.get(leaf)

    leaf = parts[-1]
    if parts[1] == "stem":
        if parts[2] == "conv" and leaf == "kernel":
            return "MobilenetV1/Conv2d_0/weights"
        if parts[2] == "bn" and bn_suffix(leaf):
            return f"MobilenetV1/Conv2d_0/{bn_suffix(leaf)}"
        return None
    if parts[1].startswith("block_"):
        i = int(parts[1].split("_")[1]) + 1  # slim numbers from 1
        kind = {"depthwise": "depthwise", "pointwise": "pointwise"}.get(
            parts[2]
        )
        if kind is None:
            return None
        base = f"MobilenetV1/Conv2d_{i}_{kind}"
        if parts[3] == "conv" and leaf == "kernel":
            w = "depthwise_weights" if kind == "depthwise" else "weights"
            return f"{base}/{w}"
        if parts[3] == "bn" and bn_suffix(leaf):
            return f"{base}/{bn_suffix(leaf)}"
    return None


def import_tf_checkpoint(
    checkpoint_path: str,
    flax_params: Any,
    name_map: Callable[[str], str | None] | Mapping[str, str],
) -> Any:
    """Load a TF checkpoint's tensors into a flax param tree by name.

    `name_map` maps a flax param path (e.g.
    'backbone/block_0/depthwise/conv/kernel') to the TF variable name, or
    None to keep the flax init. TF and flax both store dense conv kernels
    HWIO; TF-slim *depthwise* kernels are (H, W, C, 1) where flax's
    grouped-conv kernel is (H, W, 1, C) — those are adapted automatically
    when the transposed shape matches exactly. Returns a new param tree;
    raises on any other shape mismatch so silent mis-mapping is impossible.
    """
    import tensorflow as tf  # CPU-only usage (SURVEY.md §7)

    reader = tf.train.load_checkpoint(checkpoint_path)
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(flax_params), sep="/"
    )
    out = {}
    for path, value in flat.items():
        tf_name = (
            name_map(path) if callable(name_map) else name_map.get(path)
        )
        if tf_name is None:
            out[path] = value
            continue
        tensor = np.asarray(reader.get_tensor(tf_name))
        if (
            tensor.shape != value.shape
            and tensor.ndim == 4
            and 1 in tensor.shape[-2:]
            and tensor.transpose(0, 1, 3, 2).shape == tuple(value.shape)
        ):
            # slim depthwise (H, W, C, 1) <-> flax grouped (H, W, 1, C)
            tensor = tensor.transpose(0, 1, 3, 2)
        if tensor.shape != value.shape:
            raise ValueError(
                f"shape mismatch importing {tf_name} -> {path}: "
                f"{tensor.shape} vs {value.shape}"
            )
        out[path] = tensor.astype(value.dtype)
    unflat = flax.traverse_util.unflatten_dict(out, sep="/")
    return flax.serialization.from_state_dict(flax_params, unflat)
