"""COCO segmentation decoding: RLE (uncompressed + compressed) and polygons.

Reference counterpart: the reference serializes "segmentation/crowd masks"
into its tfrecords via pycocotools (SURVEY.md §2 "Data prep" row), and its
input pipeline builds "loss masks for unannotated/crowd regions" from them.
pycocotools is absent in this environment (SURVEY.md §7), so this module
implements the two COCO mask encodings directly:

  * uncompressed RLE: {"counts": [int, ...], "size": [h, w]} — run lengths
    of alternating 0/1 values over the mask flattened in COLUMN-major
    (Fortran) order, starting with zeros.
  * compressed RLE: {"counts": "<ascii string>", "size": [h, w]} — each
    count is a variable-length little-endian base-32 integer (5 value bits
    per char, bit 0x20 = continuation, chars offset by 48), and counts
    after the first two are delta-encoded against counts[i-2]
    (pycocotools' rleFrString).
  * polygons: [[x0, y0, x1, y1, ...], ...] — rasterized with cv2.fillPoly
    (pycocotools uses its own scanline fill; edge pixels can differ by
    ±1 px, which is far below the stride-4 loss-mask resolution these
    masks feed).
"""

from __future__ import annotations

import numpy as np


def rle_counts_to_mask(counts: list[int], h: int, w: int) -> np.ndarray:
    """Alternating-run counts (starting with zeros, column-major) → bool
    mask [h, w]."""
    flat = np.zeros(h * w, dtype=bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    if pos != h * w:
        raise ValueError(f"RLE counts sum to {pos}, expected {h * w}")
    return flat.reshape((h, w), order="F")


def mask_to_rle_counts(mask: np.ndarray) -> list[int]:
    """bool [h, w] → alternating-run counts (column-major, zeros first)."""
    flat = np.asarray(mask, bool).reshape(-1, order="F")
    # Run boundaries.
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return counts

def decode_rle_string(s: str) -> list[int]:
    """pycocotools' compressed counts string → run counts (rleFrString)."""
    counts: list[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)  # sign-extend
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def encode_rle_string(counts: list[int]) -> str:
    """Run counts → pycocotools' compressed string (rleToString)."""
    out = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            # Continue while remaining bits disagree with the sign bit.
            more = (x != -1 if chunk & 0x10 else x != 0)
            if more:
                chunk |= 0x20
            out.append(chr(chunk + 48))
    return "".join(out)


def polygons_to_mask(
    polygons: list[list[float]], h: int, w: int
) -> np.ndarray:
    """COCO polygon list ([[x0, y0, x1, y1, ...], ...]) → bool mask [h, w]."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


def annotation_mask(segmentation, h: int, w: int) -> np.ndarray | None:
    """One COCO annotation's `segmentation` field → bool mask [h, w].

    Handles polygons (list), uncompressed RLE (dict with list counts) and
    compressed RLE (dict with str counts). Returns None when the field is
    missing/empty.
    """
    if not segmentation:
        return None
    if isinstance(segmentation, dict):
        sh, sw = segmentation.get("size", (h, w))
        counts = segmentation["counts"]
        if isinstance(counts, str):
            counts = decode_rle_string(counts)
        mask = rle_counts_to_mask(list(counts), int(sh), int(sw))
        if mask.shape != (h, w):
            raise ValueError(
                f"RLE size {mask.shape} != image size {(h, w)}"
            )
        return mask
    return polygons_to_mask(segmentation, h, w)


def region_masks(
    segmentations: list,
    iscrowd: np.ndarray,
    keypoints: np.ndarray,
    boxes: np.ndarray,
    h: int,
    w: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-image union masks from per-person segmentations.

    Returns (exclude[h, w], person[h, w]):
      * exclude — union of segmentations of crowd persons AND persons with
        zero labeled keypoints: exactly the regions the heatmap loss must
        ignore ("loss masks for unannotated/crowd regions", SURVEY.md §2).
      * person — union of ALL persons' segmentations: the auxiliary
        segmentation head's target.
    A person WITHOUT a segmentation contributes their box rectangle
    instead (boxes[P, 4] are (y0, x0, y1, x1) pixels), so the returned
    masks are complete and downstream consumers never need a second
    fallback pass.
    """
    exclude = np.zeros((h, w), bool)
    person = np.zeros((h, w), bool)
    for i, seg in enumerate(segmentations):
        m = annotation_mask(seg, h, w)
        if m is None:
            y0, x0, y1, x1 = np.maximum(np.asarray(boxes[i]), 0.0)
            m = np.zeros((h, w), bool)
            m[int(y0) : int(np.ceil(y1)) + 1,
              int(x0) : int(np.ceil(x1)) + 1] = True
        person |= m
        unlabeled = not (np.asarray(keypoints[i])[:, 2] > 0).any()
        if bool(iscrowd[i]) or unlabeled:
            exclude |= m
    return exclude, person
