"""Inference API: the reference's `predict(image)` contract, TPU-native.

Reference counterpart: `pose_estimator.py` / `KeypointDetector.predict`
(SURVEY.md §2 "Inference API" row, §3.4). The reference runs three separate
host↔device round-trips (keypoint graph → NumPy decode → detector graph →
per-box PRN loop); here preprocessing, the joint forward, heatmap decode,
box decode + NMS, and PRN assignment compile into ONE XLA program per batch
shape (BASELINE.json north star: "compiled as one XLA program").

Public contract (mirrors the reference, SURVEY.md §1 L6):
    predictor.predict(image) -> list[PersonPrediction]
with per-person (box, score, keypoints[17, 3]) in original image coords.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multiposenet_tpu.config import Config
from multiposenet_tpu.models.posenet import MultiPoseNet
from multiposenet_tpu.models.prn import PRN
from multiposenet_tpu.ops import decode as decode_ops
from multiposenet_tpu.ops import pose_nms as pose_nms_ops
from multiposenet_tpu.ops import prn_ops
from multiposenet_tpu.ops import decode_pallas as decode_pallas_mod
from multiposenet_tpu.ops.decode_pallas import (
    decode_heatmaps_pallas,
    decode_heatmaps_pallas_lanes,
    decode_heatmaps_pallas_t,
)
from multiposenet_tpu.ops.detection import postprocess_detections
from multiposenet_tpu.ops import image as image_ops
from multiposenet_tpu.ops.image import resize_pad_normalize


@dataclasses.dataclass
class PersonPrediction:
    """One detected person: box (y0, x0, y1, x1), score, keypoints[17, 3]
    rows of (x, y, score) in original image coordinates."""

    box: np.ndarray
    score: float
    keypoints: np.ndarray


class Predictor:
    """Loads (or randomly initializes) model params and serves predictions."""

    def __init__(
        self,
        config: Config | None = None,
        variables: Any | None = None,
        prn_variables: Any | None = None,
        image_size: int | None = None,
        rng_seed: int = 0,
        use_pallas_decode: bool | None = None,
        fold_bn: bool = False,
        flip_tta: bool = False,
        pallas_interpret: bool = False,
    ):
        self.config = config or Config()
        self.image_size = image_size or self.config.train.image_size
        self.model = MultiPoseNet(config=self.config, with_detector=True)
        if variables is None:
            rng = jax.random.PRNGKey(rng_seed)
            dummy = jnp.zeros(
                (1, self.image_size, self.image_size, 3), jnp.float32
            )
            variables = self.model.init(rng, dummy, train=False)
        if fold_bn and not self.config.model.bn_folded:
            # Freeze-graph-style export optimization: BN baked into conv
            # kernel+bias, model switched to its bn_folded flavor
            # (infer/folding.py).
            from multiposenet_tpu.infer.folding import fold_batch_norm

            variables = fold_batch_norm(
                variables, epsilon=self.config.model.bn_epsilon
            )
            self.config = self.config.replace(
                model=dataclasses.replace(self.config.model,
                                          bn_folded=True)
            )
            self.model = MultiPoseNet(config=self.config,
                                      with_detector=True)
        self.variables = variables

        cfg = self.config
        self.prn = PRN(
            crop_height=cfg.prn.crop_height,
            crop_width=cfg.prn.crop_width,
            num_keypoints=cfg.model.num_keypoints,
            hidden_units=cfg.prn.hidden_units,
            dtype=jnp.dtype(cfg.model.compute_dtype),
        )
        if prn_variables is None:
            dummy_crops = jnp.zeros(
                (1, cfg.model.num_keypoints,
                 cfg.prn.crop_height * cfg.prn.crop_width),
                jnp.float32,
            )
            prn_variables = self.prn.init(
                jax.random.PRNGKey(rng_seed + 1), dummy_crops
            )
        self.prn_variables = prn_variables

        # The fused Pallas decode kernel targets the canonical stride-4 map
        # (lane-aligned W); fall back to the identical jnp implementation
        # elsewhere (e.g. CPU tests at small sizes).
        hm = self.image_size // cfg.model.output_stride
        if use_pallas_decode is None:
            use_pallas_decode = (
                jax.default_backend() == "tpu" and hm % 128 == 0
            )
        self.use_pallas_decode = use_pallas_decode
        # interpret=True runs the Pallas kernels as traced jax ops — the
        # CPU-mesh validation path (dryrun_multichip / test_sharding) for
        # the kernel layouts the shipped TPU config uses.
        self.pallas_interpret = pallas_interpret
        self.flip_tta = flip_tta
        self._kp_forward = jax.jit(self._kp_forward_impl)
        self._full_forward = jax.jit(self._full_forward_impl)

    # ---------------------------------------------------------------- #
    # Keypoint-only path (judged config #1: single-image heatmap
    # inference at 512x512).
    # ---------------------------------------------------------------- #

    def _decode(self, heatmaps: jnp.ndarray) -> decode_ops.DecodedPeaks:
        if self.use_pallas_decode:
            # Transpose to [B*K, H, W] in the model's compute dtype — the
            # heatmaps were computed in it before posenet's f32 upcast, so
            # the downcast is lossless and the 142 MB transpose copy
            # halves; the kernel recasts to f32 in VMEM.
            dtype = jnp.dtype(self.config.model.compute_dtype)
            return decode_heatmaps_pallas(heatmaps.astype(dtype),
                                          self.config.decode,
                                          interpret=self.pallas_interpret)
        return decode_ops.decode_heatmaps(heatmaps, self.config.decode)

    def _decode_cm(self, heatmaps: jnp.ndarray, hm_cm: jnp.ndarray):
        """Decode from the shared channel-major layout (falls back to the
        jnp reference on the [B, H, W, K] tensor off-TPU)."""
        if self.use_pallas_decode:
            b, k, h, w = hm_cm.shape
            if decode_pallas_mod.DECODE_LANES:
                # Maps-on-lanes kernel: consumes the NCHW conv output as a
                # pure layout view (no relayout copy at the custom-call
                # boundary — see decode_pallas.DECODE_LANES).
                return decode_heatmaps_pallas_lanes(
                    hm_cm, (b, k), self.config.decode,
                    interpret=self.pallas_interpret,
                )
            return decode_heatmaps_pallas_t(
                hm_cm.reshape(b * k, h, w), (b, k), self.config.decode,
                interpret=self.pallas_interpret,
            )
        return decode_ops.decode_heatmaps(heatmaps, self.config.decode)

    def _kp_forward_impl(
        self, variables: Any, image: jnp.ndarray
    ) -> dict[str, jnp.ndarray]:
        """uint8 [H, W, 3] → heatmaps + decoded peaks, one XLA program."""
        x, scale = resize_pad_normalize(
            image, self.image_size,
            normalize_out=not self.config.model.fold_input_norm,
        )
        out = self._forward_heatmaps(variables, x[None])
        peaks = self._decode(out["heatmaps"])
        peaks = decode_ops.peaks_to_image_coords(
            peaks, self.config.model.output_stride
        )
        return {
            "heatmaps": out["heatmaps"],
            "peak_positions": peaks.positions,
            "peak_scores": peaks.scores,
            "peak_valid": peaks.valid,
            "scale": scale,
        }

    def predict_heatmaps(self, image: np.ndarray) -> np.ndarray:
        """uint8 [H, W, 3] → [H/4, W/4, 17] heatmaps (model coords)."""
        out = self._kp_forward(self.variables, jnp.asarray(image))
        return np.asarray(out["heatmaps"][0])

    def predict_keypoints(
        self, image: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """uint8 [H, W, 3] → per-channel candidate peaks in ORIGINAL image
        coordinates.

        Returns (positions[K, P, 2] as (y, x), scores[K, P], valid[K, P]).
        """
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(
                "predict expects an RGB image of shape [H, W, 3], got "
                f"{image.shape}"
            )
        out = self._kp_forward(self.variables, jnp.asarray(image))
        scale = np.asarray(out["scale"])
        positions = np.asarray(out["peak_positions"][0]) / scale
        # Peaks in the zero-padded region (beyond the aspect-preserving
        # extent) are not real image content — invalidate them.
        h, w = image.shape[:2]
        inside = (
            (positions[..., 0] <= h - 1) & (positions[..., 1] <= w - 1)
        )
        valid = np.asarray(out["peak_valid"][0]) & inside
        return positions, np.asarray(out["peak_scores"][0]), valid

    # ---------------------------------------------------------------- #
    # Full multi-person pipeline (judged configs #3 and #4): joint
    # forward + detection + PRN assignment, one XLA program.
    # ---------------------------------------------------------------- #

    def _heatmaps_cm(self, out: dict) -> jnp.ndarray:
        """Channel-major heatmaps [B, K, H, W] in the compute dtype — the
        ONE layout shared by the Pallas decode kernel and the PRN crop
        einsums. The keypoint head emits this natively from its output
        conv (models/keypoint_head.py "heatmaps_cm"); programs that read
        it never materialize a transpose. Fallback (flip TTA averages the
        NHWC maps first): transpose — computed in the compute dtype, so
        the copy is half the f32 size and lossless."""
        if "heatmaps_cm" in out:
            return out["heatmaps_cm"]
        dtype = jnp.dtype(self.config.model.compute_dtype)
        return jnp.transpose(out["heatmaps"].astype(dtype), (0, 3, 1, 2))

    def _prn_assign(
        self, prn_variables: Any, heatmaps_cm: jnp.ndarray,
        hm_boxes: jnp.ndarray, peaks,
    ) -> jnp.ndarray:
        """Channel-major heatmaps + person boxes (+ decoded peaks) →
        per-person keypoints [B, D, K, 3] in heatmap coordinates.

        PRN argmax cells are snapped to the decode kernel's sub-pixel peaks
        (ops/prn_ops.snap_to_peaks) — the PRN decides WHICH peak belongs to
        this person, the peak provides the quarter-pixel position."""
        cfg = self.config
        # Crop a margin-expanded view of each box (config.prn.crop_margin;
        # PRN training applies the same margin) — edge keypoints of an
        # imperfect detector box stay in the PRN's view. All downstream
        # box-dependent math (inverse mapping, snap pitch) uses the same
        # expanded boxes, so coordinates stay exact. (A two-pass variant
        # that re-cropped at the pass-1 keypoint extent was measured and
        # rejected — NOTES_r3.md "two-pass PRN".)
        hm_boxes = prn_ops.expand_boxes(hm_boxes, cfg.prn.crop_margin)
        b, d = hm_boxes.shape[:2]
        if prn_ops.CROP_KM_NATIVE:
            # Second crop einsum emits [P, K, cw, ch] natively; the
            # [B*D, K, hw] flatten is contiguous (same flat = j*ch + i
            # order) — see prn_ops.CROP_KM_NATIVE.
            crops_km = prn_ops.batched_crop_heatmaps_km(
                heatmaps_cm, hm_boxes,
                cfg.prn.crop_height, cfg.prn.crop_width,
            ).reshape(b * d, cfg.model.num_keypoints, -1)
        else:
            crops = prn_ops.batched_crop_heatmaps_cm(
                heatmaps_cm, hm_boxes,
                cfg.prn.crop_height, cfg.prn.crop_width,
            )  # [B, D, cw, ch, K]
            crops_km = prn_ops.to_channel_major(
                crops, cfg.model.num_keypoints
            )  # [B*D, K, hw]
        # Logits, not softmax: argmax is identical and the softmax over
        # [B*D, K, hw] costs real HBM traffic at inference.
        prn_out = self.prn.apply(prn_variables, crops_km,
                                 return_logits=True)
        flat_boxes = hm_boxes.reshape(b * d, 4)
        keypoints = prn_ops.keypoints_from_prn(
            prn_out, crops_km, flat_boxes,
            cfg.prn.crop_height, cfg.prn.crop_width,
        ).reshape(b, d, cfg.model.num_keypoints, 3)  # (x, y, score)
        if peaks is not None and cfg.prn.snap_radius_cells > 0:
            keypoints = prn_ops.snap_to_peaks(
                keypoints, hm_boxes,
                peaks.positions, peaks.scores, peaks.valid,
                cfg.prn.crop_height, cfg.prn.crop_width,
                cfg.prn.snap_radius_cells,
            )
        return keypoints

    def _full_forward_impl(
        self, variables: Any, prn_variables: Any, image: jnp.ndarray
    ) -> dict[str, jnp.ndarray]:
        cfg = self.config
        x, scale = resize_pad_normalize(
            image, self.image_size,
            normalize_out=not cfg.model.fold_input_norm,
        )
        out = self._forward_heatmaps(variables, x[None])

        detections = postprocess_detections(
            out["detector"], self.image_size, cfg.detector
        )
        # Person boxes in heatmap coordinates for the PRN crop.
        stride = float(cfg.model.output_stride)
        hm_boxes = detections.boxes / stride  # [1, D, 4]
        hm_cm = self._heatmaps_cm(out)
        peaks = self._decode_cm(out["heatmaps"], hm_cm)
        keypoints = self._prn_assign(
            prn_variables, hm_cm, hm_boxes, peaks
        )
        # Heatmap coords → model-input coords.
        keypoints = keypoints.at[..., :2].multiply(stride)
        box_valid = detections.valid
        if cfg.detector.pose_nms_oks > 0.0:
            box_valid = pose_nms_ops.pose_nms(
                keypoints, detections.boxes, box_valid,
                cfg.detector.pose_nms_oks,
            )
        return {
            "boxes": detections.boxes,
            "box_scores": detections.scores,
            "box_valid": box_valid,
            "keypoints": keypoints,
            "scale": scale,
        }

    def predict(self, image: np.ndarray) -> list[PersonPrediction]:
        """uint8 [H, W, 3] RGB → per-person predictions in original coords.

        Mirrors the reference contract `predict(image) -> [(box, score,
        kp[17, 3]), ...]` (SURVEY.md §3.4).
        """
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(
                "predict expects an RGB image of shape [H, W, 3], got "
                f"{image.shape}"
            )
        out = self._full_forward(
            self.variables, self.prn_variables, jnp.asarray(image)
        )
        scale = float(out["scale"])
        boxes = np.asarray(out["boxes"][0]) / scale
        scores = np.asarray(out["box_scores"][0])
        valid = np.asarray(out["box_valid"][0])
        kps = np.array(out["keypoints"][0])  # writable copy
        kps[..., :2] /= scale

        h, w = image.shape[:2]
        results = []
        for i in np.flatnonzero(valid):
            box = np.clip(boxes[i], 0.0, [h - 1, w - 1, h - 1, w - 1])
            kp = kps[i].copy()
            kp[:, 0] = np.clip(kp[:, 0], 0.0, w - 1)
            kp[:, 1] = np.clip(kp[:, 1], 0.0, h - 1)
            results.append(
                PersonPrediction(box=box, score=float(scores[i]),
                                 keypoints=kp)
            )
        return results

    def predict_given_boxes(
        self, image: np.ndarray, boxes: np.ndarray
    ) -> np.ndarray:
        """Per-person keypoints for CALLER-SUPPLIED person boxes.

        The reference's PRN is trained and evaluated on GT boxes
        (SURVEY.md §3.3); this runs the same keypoint-forward → decode →
        PRN-assignment pipeline with `boxes` ([P, 4] (y0, x0, y1, x1) in
        original image pixels) instead of the detector output. Returns
        keypoints[P, 17, 3] rows (x, y, score) in original image coords.
        """
        image = np.asarray(image)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        p = boxes.shape[0]
        pad = self.config.prn.max_persons
        # More boxes than the static PRN slot count: chunk through repeated
        # forward calls (re-runs the keypoint forward per chunk) instead of
        # silently truncating (ADVICE r2).
        scale = 1.0
        pieces = []
        for s in range(0, max(p, 1), pad):
            chunk = boxes[s:s + pad]
            padded = np.zeros((pad, 4), np.float32)
            padded[:len(chunk)] = chunk
            out = self._boxes_forward(
                self.variables, self.prn_variables, jnp.asarray(image),
                jnp.asarray(padded),
            )
            scale = float(out["scale"])
            pieces.append(np.array(out["keypoints"][0][:len(chunk)]))
        kps = np.concatenate(pieces, axis=0)[:p]
        kps[..., :2] /= scale
        h, w = image.shape[:2]
        kps[..., 0] = np.clip(kps[..., 0], 0.0, w - 1)
        kps[..., 1] = np.clip(kps[..., 1], 0.0, h - 1)
        return kps

    @functools.cached_property
    def _boxes_forward(self):
        def impl(variables, prn_variables, image, boxes):
            cfg = self.config
            x, scale = resize_pad_normalize(
                image, self.image_size,
                normalize_out=not cfg.model.fold_input_norm,
            )
            out = self._forward_heatmaps(variables, x[None])
            stride = float(cfg.model.output_stride)
            hm_boxes = (boxes * scale / stride)[None]  # [1, P, 4]
            hm_cm = self._heatmaps_cm(out)
            peaks = self._decode_cm(out["heatmaps"], hm_cm)
            keypoints = self._prn_assign(
                prn_variables, hm_cm, hm_boxes, peaks
            )
            keypoints = keypoints.at[..., :2].multiply(stride)
            return {"keypoints": keypoints, "scale": scale}

        return jax.jit(impl)

    # ---------------------------------------------------------------- #
    # Sharded batched inference (judged config #5): batch dim sharded
    # data-parallel over the ICI mesh, one XLA program.
    # ---------------------------------------------------------------- #

    def _forward_heatmaps(
        self, variables: Any, x: jnp.ndarray
    ) -> dict[str, Any]:
        """Model forward, optionally averaging heatmaps with a horizontal
        flip pass (flip test-time augmentation: flipped image → flip the
        heatmaps back and swap L/R keypoint channels — the reference
        community's standard OKS-AP booster)."""
        out = self.model.apply(variables, x, train=False)
        if self.flip_tta:
            # The averaged heatmaps below supersede the head's native
            # channel-major output — drop it so no consumer reads stale
            # (un-averaged) maps.
            out.pop("heatmaps_cm", None)
            from multiposenet_tpu.utils.constants import FLIP_PERMUTATION

            xf = x[:, :, ::-1]
            if x.shape[-1] == 12:
                # s2d layout: reversing the cell axis flips 2-pixel cells;
                # also swap the px=0/1 phase channels ((py*2+px)*3+c).
                perm = jnp.asarray([
                    (py * 2 + (1 - px)) * 3 + c
                    for py in (0, 1) for px in (0, 1) for c in range(3)
                ])
                xf = xf[..., perm]
            elif x.shape[-1] == 48:
                # composed s4 cells ((py1,px1) major, (py0,px0), rgb):
                # reversing the 4-px cell axis + mirroring both px phases.
                perm = jnp.asarray([
                    ((py1 * 2 + (1 - px1)) * 4 + py0 * 2 + (1 - px0)) * 3
                    + c
                    for py1 in (0, 1) for px1 in (0, 1)
                    for py0 in (0, 1) for px0 in (0, 1)
                    for c in range(3)
                ])
                xf = xf[..., perm]
            out_f = self.model.apply(variables, xf, train=False)
            hm_f = out_f["heatmaps"][:, :, ::-1]
            hm_f = hm_f[..., jnp.asarray(FLIP_PERMUTATION)]
            out["heatmaps"] = 0.5 * (out["heatmaps"] + hm_f)
        return out

    def _batch_forward_impl(
        self, variables: Any, prn_variables: Any, images: jnp.ndarray
    ) -> dict[str, jnp.ndarray]:
        """Preprocess + joint forward + decode + detection + PRN for a
        uint8 batch, one XLA program.

        images may be:
          * [B, S/4, S*12] — host-staged 4x4 space-to-depth flat layout
            (ops/image.space_to_depth_flat4), the fast path for
            stem_stride=4 models: the stem matmul consumes the cells with
            zero device-side retiling;
          * [B, S*12, S/4] — TRANSPOSED s4-flat staging
            (ops/image.space_to_depth_flat4_t): same cells, host
            pre-applies the {0,2,1} relayout the device would otherwise
            copy into;
          * [B, S/2, S*6] — host-staged 2x2 space-to-depth flat layout
            (ops/image.space_to_depth_flat): the device normalizes at
            full lane density and the stem consumes the s2d cells;
          * [B, S, S, 3] — host already letterboxed to the model size,
            only normalize runs on device;
          * [B, Hs, Ws, 3] — fixed staging shape, bilinear resize to the
            model size runs on device as two constant-matrix matmuls."""
        cfg = self.config
        dtype = jnp.dtype(cfg.model.compute_dtype)
        raw = cfg.model.fold_input_norm  # stem consumes raw 0-255 pixels
        if images.ndim == 3 and images.shape[2] == images.shape[1] * 48:
            # s4-flat staging (ops/image.space_to_depth_flat4).
            x = (image_ops.s4_flat_to_cells(images, dtype) if raw
                 else image_ops.normalize_s4_flat(images, dtype))
        elif images.ndim == 3 and images.shape[1] == images.shape[2] * 48:
            # TRANSPOSED s4-flat staging (space_to_depth_flat4_t): bytes
            # arrive in the {0,2,1} physical order the stem pipeline
            # reads, so this transpose is a layout-change bitcast instead
            # of the 0.43 ms relayout copy (NOTES_r5 profile).
            flat = jnp.transpose(images, (0, 2, 1))
            x = (image_ops.s4_flat_to_cells(flat, dtype) if raw
                 else image_ops.normalize_s4_flat(flat, dtype))
        elif images.ndim == 3:
            x = (image_ops.s2d_flat_to_cells(images, dtype) if raw
                 else image_ops.normalize_s2d_flat(images, dtype))
        elif images.shape[1:3] == (self.image_size, self.image_size):
            x = (images.astype(jnp.float32) if raw
                 else image_ops.normalize(images))
        else:
            x = image_ops.resize_normalize_batch(
                images, self.image_size, normalize_out=not raw
            )
        out = self._forward_heatmaps(variables, x)

        hm_cm = self._heatmaps_cm(out)
        peaks = self._decode_cm(out["heatmaps"], hm_cm)
        detections = postprocess_detections(
            out["detector"], self.image_size, cfg.detector
        )
        stride = float(cfg.model.output_stride)
        hm_boxes = detections.boxes / stride
        keypoints = self._prn_assign(
            prn_variables, hm_cm, hm_boxes, peaks
        )
        keypoints = keypoints.at[..., :2].multiply(stride)
        box_valid = detections.valid
        if cfg.detector.pose_nms_oks > 0.0:
            box_valid = pose_nms_ops.pose_nms(
                keypoints, detections.boxes, box_valid,
                cfg.detector.pose_nms_oks,
            )
        return {
            "boxes": detections.boxes,
            "box_scores": detections.scores,
            "box_valid": box_valid,
            "keypoints": keypoints,
            "peak_positions": peaks.positions * stride,
            "peak_scores": peaks.scores,
            "peak_valid": peaks.valid,
        }

    def make_batch_runner(self, mesh=None):
        """Compile the batched pipeline with the batch dim sharded over the
        data mesh. Returns fn(uint8 images [B, S, S, 3]) -> output dict;
        B must be divisible by the mesh size."""
        from multiposenet_tpu.parallel import mesh as mesh_lib

        if mesh is None:
            mesh = mesh_lib.make_mesh()
        batch_sh = mesh_lib.batch_sharding(mesh)
        repl = mesh_lib.replicated(mesh)
        variables = mesh_lib.replicate(self.variables, mesh)
        prn_variables = mesh_lib.replicate(self.prn_variables, mesh)

        # NOTE: no donate_argnums — donation breaks the axon PJRT plugin
        # (see train/loop.py).
        fn = jax.jit(
            self._batch_forward_impl,
            in_shardings=(repl, repl, batch_sh),
            out_shardings=batch_sh,
        )

        def run(images):
            images = jax.device_put(jnp.asarray(images), batch_sh)
            return fn(variables, prn_variables, images)

        return run
