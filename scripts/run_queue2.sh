#!/bin/bash
# Round-3 TPU queue, stage 2: multi-object quality ladder (seed variance +
# group-budget sweep, both eval'd through the exact oracle renderer), the
# Waymo-format multi-object demo run (BASELINE target #5), and a bench
# refresh.
set -x
cd /root/repo

timeout 3000 python scripts/quality_ab_multi.py 600 seeds
timeout 2400 python scripts/quality_ab_multi.py 600 fracs
timeout 4500 python scripts/run_waymo_demo_r3.py 3000
timeout 900 python bench.py
echo "QUEUE2 DONE"
