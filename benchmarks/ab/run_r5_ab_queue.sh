#!/bin/bash
# Round-5 A/B backlog (VERDICT r4 missing #2), serialized. Rebuilds the
# /tmp crowd-model cache (fresh box), then records the two unrun round-4
# harnesses: crop-margin counter-lever and the iou_head cure for the
# attributed ~36% crowd box-quality loss (crowd + sparse regression
# check). All on fixtures v1 (the attribution arena; the round-4 "v2"
# rendering was diagnosed unlearnable — NOTES_r5.md).
#
# Platform: the REAL TPU chip (session default JAX_PLATFORMS=axon) — the
# box has 1 CPU core and the backend is back (NOTES_r5.md), so the CPU
# plan (~10 h serial) is replaced by TPU runs (~2 h measured via
# /tmp/r5_tpu_128_probe.log: full 128² train+PRN+predict+eval path rc=0
# on the chip). Both arms of every A/B run on the same platform, so
# deltas stay internally consistent; absolute numbers are fresh
# measurements either way (see make_crowd_cache.py NOTE on /tmp caches).
set -x
cd "$(dirname "$0")"

timeout 1800 python make_crowd_cache.py         > /tmp/r5_crowd_cache.log 2>&1
timeout 3600 python margin_crowd_ab.py          > /tmp/r5_margin_crowd.log 2>&1
timeout 5400 python iou_head_ab.py              > /tmp/r5_iou_head_crowd.log 2>&1
timeout 5400 python iou_head_ab.py --sparse     > /tmp/r5_iou_head_sparse.log 2>&1

echo AB QUEUE DONE
