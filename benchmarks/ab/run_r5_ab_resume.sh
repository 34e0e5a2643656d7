#!/bin/bash
# Round-5 A/B queue RESUME (the session restart cut run_r5_ab_queue.sh
# mid-margin-sweep). Already banked in /tmp/r5_margin_crowd.log:
# s0 margins {0.0,0.1,0.2,0.3} and s11 margins {0.0,0.1}. This resumes
# with margins {0.2,0.3} (the script runs both seeds per margin, so the
# duplicated s0 rows double as a determinism check against the first
# pass), then runs the two iou_head A/Bs. Model caches /tmp/ab_crowd_*
# exist, so no retrain for the margin arms. Platform: real TPU chip.
set -x
cd "$(dirname "$0")"
export JAX_PLATFORMS=axon

timeout 5400 python margin_crowd_ab.py 0.2 0.3  > /tmp/r5_margin_crowd_resume.log 2>&1
timeout 7200 python iou_head_ab.py              > /tmp/r5_iou_head_crowd.log 2>&1
timeout 7200 python iou_head_ab.py --sparse     > /tmp/r5_iou_head_sparse.log 2>&1

echo AB QUEUE RESUME DONE
