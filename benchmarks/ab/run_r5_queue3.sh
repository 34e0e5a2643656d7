#!/bin/bash
# Round-5 follow-up queue, launched after the iou_head sparse A/B
# (chained by run_r5_ab_resume.sh) exits:
#   1. Crowd-preset TPU perf cost (runbook step 3, still unrun this round).
#   2. Per-stage device-time profile (runbook step 4).
# Serial on purpose: one CPU core, one chip.
set -x
cd /root/repo
export JAX_PLATFORMS=axon
timeout 3600 python benchmarks/ab/abench.py base crowdpreset crowdiouh crowdposenms \
    > /tmp/r5_abench_crowd.log 2>&1
timeout 1800 python benchmarks/profile_e2e.py > /tmp/r5_profile.log 2>&1
echo QUEUE3 DONE
