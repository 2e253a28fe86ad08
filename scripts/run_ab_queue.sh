#!/bin/bash
# Round-3 TPU A/B queue: encoding PSNR-at-target-step matrix (VERDICT item 4).
set -x
cd /root/repo

# --- encoding PSNR at target step (object scene, 15000 iters) -------------
AB_ITERS=15000 BENCH_NHASH=0 BENCH_NLEVELS=12 BENCH_NFEATS=8 \
  BENCH_CPMAX=2048 BENCH_REMAT=0 timeout 3600 python scripts/quality_ab_r2.py
AB_ITERS=15000 BENCH_NHASH=2 BENCH_NLEVELS=10 BENCH_NFEATS=4 \
  BENCH_CPMAX=512 BENCH_REMAT=1 timeout 5400 python scripts/quality_ab_r2.py

# --- encoding PSNR at target step (street scene, 15000 iters) -------------
AB_ITERS=15000 BENCH_NHASH=0 BENCH_NLEVELS=12 BENCH_NFEATS=8 \
  BENCH_CPMAX=2048 BENCH_REMAT=0 timeout 3600 python scripts/quality_ab_street.py
AB_ITERS=15000 BENCH_NHASH=2 BENCH_NLEVELS=10 BENCH_NFEATS=4 \
  BENCH_CPMAX=512 BENCH_REMAT=1 timeout 5400 python scripts/quality_ab_street.py
echo "AB QUEUE DONE"
