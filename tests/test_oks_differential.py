"""Randomized differential test of eval/oks.py against an INDEPENDENT
brute-force re-implementation of the COCOeval keypoint protocol.

VERDICT r2 item 5: the 19 hand-computed cases in test_oks.py were authored
by the same person who wrote the evaluator; this oracle is written
separately, straight from pycocotools' published algorithm (cocoeval.py:
computeOks / evaluateImg / accumulate / summarize), in deliberately
different style — scalar per-threshold greedy loops, dict records, no code
shared with multiposenet_tpu/eval/oks.py — and the two are compared for
EXACT stat equality over hundreds of randomized scenes covering crowds,
keypoint-less GTs, area-range boundary values, score ties, and
maxDets-overflow detection lists.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from multiposenet_tpu.eval.oks import (
    DetectionKP,
    GroundTruth,
    KeypointEvaluator,
)

# pycocotools cocoeval.py constants, restated here (not imported).
SIGMAS = np.array([
    2.6, 2.5, 2.5, 3.5, 3.5, 7.9, 7.9, 7.2, 7.2, 6.2,
    6.2, 10.7, 10.7, 8.7, 8.7, 8.9, 8.9,
]) / 100.0
THRS = [0.5 + 0.05 * i for i in range(10)]
REC_THRS = [i / 100.0 for i in range(101)]
RANGES = {
    "all": (0.0, 1e10),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAXDETS = 20


def oracle_oks_pair(dkp, g):
    """cocoeval.computeOks for one (dt, gt) pair, scalar math."""
    vars_ = (SIGMAS * 2.0) ** 2
    xg, yg, vg = g["kp"][:, 0], g["kp"][:, 1], g["kp"][:, 2]
    k1 = int((vg > 0).sum())
    xd, yd = dkp[:, 0], dkp[:, 1]
    s2 = max(g["area"], 1e-9)
    total, n = 0.0, 0
    if k1 > 0:
        for i in range(17):
            if vg[i] <= 0:
                continue
            dx = xd[i] - xg[i]
            dy = yd[i] - yg[i]
            e = (dx * dx + dy * dy) / vars_[i] / s2 / 2.0
            total += math.exp(-e)
            n += 1
        return total / n
    if g.get("bbox") is None:
        return 0.0
    x0b, y0b, wb, hb = g["bbox"]
    z0x, z1x = x0b - wb, x0b + 2 * wb
    z0y, z1y = y0b - hb, y0b + 2 * hb
    for i in range(17):
        dx = max(z0x - xd[i], 0.0) + max(xd[i] - z1x, 0.0)
        dy = max(z0y - yd[i], 0.0) + max(yd[i] - z1y, 0.0)
        e = (dx * dx + dy * dy) / vars_[i] / s2 / 2.0
        total += math.exp(-e)
        n += 1
    return total / n


def oracle_evaluate_img(gts, dts, arng, maxdets):
    """cocoeval.evaluateImg, scalar translation."""
    for g in gts:
        base_ig = g["iscrowd"] or int((g["kp"][:, 2] > 0).sum()) == 0
        g["_ignore"] = (
            base_ig or g["area"] < arng[0] or g["area"] > arng[1]
        )
    gtind = sorted(range(len(gts)), key=lambda i: gts[i]["_ignore"])
    gts = [gts[i] for i in gtind]
    dtind = sorted(range(len(dts)), key=lambda i: -dts[i]["score"])
    dts = [dts[i] for i in dtind[:maxdets]]

    ious = [[oracle_oks_pair(d["kp"], g) for g in gts] for d in dts]
    T, D, G = len(THRS), len(dts), len(gts)
    gtm = [[0] * G for _ in range(T)]
    dtm = [[0] * D for _ in range(T)]
    gt_ig = [g["_ignore"] for g in gts]
    dt_ig = [[False] * D for _ in range(T)]
    if G:
        for tind, t in enumerate(THRS):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind][gind] > 0 and not gts[gind]["iscrowd"]:
                        continue
                    if m > -1 and not gt_ig[m] and gt_ig[gind]:
                        break
                    if ious[dind][gind] < iou:
                        continue
                    iou = ious[dind][gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind][dind] = gt_ig[m]
                dtm[tind][dind] = 1
                gtm[tind][m] = 1
    for dind, d in enumerate(dts):
        a = d["area"] < arng[0] or d["area"] > arng[1]
        for tind in range(T):
            if dtm[tind][dind] == 0 and a:
                dt_ig[tind][dind] = True
    return {
        "dtScores": [d["score"] for d in dts],
        "dtMatches": dtm,
        "dtIgnore": dt_ig,
        "numGt": sum(1 for g in gts if not g["_ignore"]),
    }


def oracle_accumulate(evals):
    """cocoeval.accumulate, scalar translation. Returns (prec[T][R],
    rec[T])."""
    T, R = len(THRS), len(REC_THRS)
    precision = [[-1.0] * R for _ in range(T)]
    recall = [-1.0] * T
    scores = [s for e in evals for s in e["dtScores"]]
    npig = sum(e["numGt"] for e in evals)
    if npig == 0:
        return precision, recall
    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    for tind in range(T):
        matches = [m for e in evals for m in e["dtMatches"][tind]]
        ignores = [m for e in evals for m in e["dtIgnore"][tind]]
        tps = [matches[i] for i in order if not ignores[i]]
        tp_sum, fp_sum, tp_list, fp_list = 0, 0, [], []
        for m in tps:
            tp_sum += 1 if m else 0
            fp_sum += 0 if m else 1
            tp_list.append(tp_sum)
            fp_list.append(fp_sum)
        nd = len(tp_list)
        rc = [t / npig for t in tp_list]
        pr = [t / max(t + f, 1e-12) for t, f in zip(tp_list, fp_list)]
        recall[tind] = rc[-1] if nd else 0.0
        q = [0.0] * R
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        # np.searchsorted(rc, recThrs, side='left')
        for ri, rt in enumerate(REC_THRS):
            pi = 0
            while pi < nd and rc[pi] < rt:
                pi += 1
            if pi < nd:
                q[ri] = pr[pi]
        precision[tind] = q
    return precision, recall


def oracle_stats(images):
    """images: list of (gts, dts) dict-record lists → summarize() dict."""
    out = {}
    for name, arng in RANGES.items():
        evals = [
            oracle_evaluate_img(
                [dict(g) for g in gts], [dict(d) for d in dts],
                arng, MAXDETS,
            )
            for gts, dts in images
        ]
        prec, rec = oracle_accumulate(evals)

        def mean_valid(rows):
            vals = [v for row in rows for v in row if v > -1]
            return sum(vals) / len(vals) if vals else -1.0

        def mean_valid_1d(vals):
            vals = [v for v in vals if v > -1]
            return sum(vals) / len(vals) if vals else -1.0

        if name == "all":
            out["AP"] = mean_valid(prec)
            out["AP50"] = mean_valid([prec[0]])
            out["AP75"] = mean_valid([prec[5]])
            out["AR"] = mean_valid_1d(rec)
            out["AR50"] = mean_valid_1d([rec[0]])
        else:
            sfx = "M" if name == "medium" else "L"
            out[f"AP{sfx}"] = mean_valid(prec)
            out[f"AR{sfx}"] = mean_valid_1d(rec)
    return out


def random_scene(rng: np.random.RandomState):
    """One randomized multi-image scene stressing the protocol's edges."""
    n_images = rng.randint(1, 4)
    images_eval = []   # for KeypointEvaluator
    images_oracle = []
    # Areas deliberately include the exact 32^2 / 96^2 boundary values.
    area_pool = [200.0, 1024.0, 1025.0, 32.0**2, 5000.0, 96.0**2,
                 9300.0, 40000.0]
    score_pool = [0.3, 0.5, 0.5, 0.7, 0.9]  # deliberate ties
    for _ in range(n_images):
        n_gt = rng.randint(0, 7)
        n_dt = rng.randint(0, 26)  # sometimes exceeds maxDets=20
        gts_e, gts_o = [], []
        for _gi in range(n_gt):
            center = rng.uniform(10, 90, 2)
            kp = np.zeros((17, 3))
            kp[:, :2] = center + rng.normal(0, 8, (17, 2))
            kp[:, 2] = rng.choice([0, 0, 1, 2], 17)
            if rng.rand() < 0.25:
                kp[:, 2] = 0  # keypoint-less GT
            area = float(rng.choice(area_pool))
            iscrowd = bool(rng.rand() < 0.25)
            bbox = None
            if rng.rand() < 0.8:
                bbox = np.array([center[0] - 10, center[1] - 12,
                                 rng.uniform(5, 30), rng.uniform(5, 30)])
            gts_e.append(GroundTruth(
                keypoints=kp.copy(), area=area, iscrowd=iscrowd,
                bbox=None if bbox is None else bbox.copy(),
            ))
            gts_o.append({
                "kp": kp.copy(), "area": area, "iscrowd": iscrowd,
                "bbox": None if bbox is None else tuple(bbox),
            })
        dts_e, dts_o = [], []
        for _di in range(n_dt):
            if gts_e and rng.rand() < 0.7:
                base = gts_e[rng.randint(len(gts_e))].keypoints[:, :2]
                xy = base + rng.normal(0, rng.choice([0.5, 3, 15]),
                                       (17, 2))
            else:
                xy = rng.uniform(0, 100, (17, 2))
            kp = np.concatenate(
                [xy, rng.uniform(0.1, 1.0, (17, 1))], axis=1
            )
            score = float(rng.choice(score_pool))
            dts_e.append(DetectionKP(keypoints=kp.copy(), score=score))
            # pycocotools loadRes detection area: keypoint-extent bbox.
            x, y = kp[:, 0], kp[:, 1]
            area = float((x.max() - x.min()) * (y.max() - y.min()))
            dts_o.append({"kp": kp.copy(), "score": score, "area": area})
        images_eval.append((gts_e, dts_e))
        images_oracle.append((gts_o, dts_o))
    return images_eval, images_oracle


@pytest.mark.parametrize("block", range(8))
def test_differential_random_scenes(block):
    for seed in range(block * 25, (block + 1) * 25):
        rng = np.random.RandomState(seed)
        images_eval, images_oracle = random_scene(rng)
        ev = KeypointEvaluator()
        for gts, dts in images_eval:
            ev.add_image(gts=gts, dts=dts)
        got = ev.summarize()
        want = oracle_stats(images_oracle)
        assert set(got) == set(want), (seed, got.keys(), want.keys())
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (
                f"seed={seed} stat={k}: evaluator={got[k]} "
                f"oracle={want[k]}"
            )


def test_differential_empty_and_degenerate():
    """No images / no dts / no gts / all-ignored corner cases agree."""
    cases = [
        [],
        [([], [])],
        [([{"kp": np.zeros((17, 3)), "area": 100.0, "iscrowd": True,
            "bbox": (0, 0, 5, 5)}], [])],
    ]
    for imgs in cases:
        ev = KeypointEvaluator()
        for gts, dts in imgs:
            ev.add_image(
                gts=[GroundTruth(keypoints=g["kp"], area=g["area"],
                                 iscrowd=g["iscrowd"],
                                 bbox=np.array(g["bbox"]))
                     for g in gts],
                dts=[],
            )
        got = ev.summarize()
        want = oracle_stats([(g, d) for g, d in imgs])
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (imgs, k)
