#!/bin/bash
# Round-4 TPU evidence runbook — run serially the moment the axon backend
# recovers (VERDICT r3 #1). Each step logs to /tmp/r4_*.log; safe to
# re-run (compile cache persists per process caveats in
# .claude/skills/verify/SKILL.md).
set -x
cd /root/repo

# 1. Official headline (driver-format JSON) + planted-peaks variant.
timeout 3600 python bench.py                  > /tmp/r4_bench.log 2>&1
timeout 2400 python bench.py --planted-peaks  > /tmp/r4_bench_planted.log 2>&1

# 2. 512² knob-confirmation grid at the shipped operating point, both
#    box losses in ONE process (no cross-process Mosaic cache). Now on
#    fixtures v2 (the round-4 default) — this is also the fixtures-v2
#    re-evidence at 512² (VERDICT #3).
timeout 28800 python benchmarks/knobs_512_ab.py --box-loss both \
    > /tmp/r4_knobs512.log 2>&1

# 3. Crowd-preset perf cost (one process, variant list).
timeout 7200 python benchmarks/ab/abench.py base crowdpreset crowdposenms \
    > /tmp/r4_abench_crowd.log 2>&1

# 4. Per-stage device-time profile for the NOTES table.
timeout 3600 python benchmarks/profile_e2e.py > /tmp/r4_profile.log 2>&1

echo RUNBOOK DONE
