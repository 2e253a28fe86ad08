#!/bin/bash
# Round-3 TPU queue, stage 3: Waymo-format demo retry (interp fix), the
# group-budget 2.0 ladder point, then the target-step encoding A/Bs.
set -x
cd /root/repo
timeout 4500 python scripts/run_waymo_demo_r3.py 3000
timeout 900 python scripts/quality_ab_multi.py 600 frac=2.0
bash scripts/run_ab_queue.sh
echo "QUEUE3 DONE"
