#!/bin/bash
# Round-5 chip queue: waits for the (possibly wedged) TPU claim to clear,
# then runs the flagship evidence runs and the perf measurements in
# priority order. Each python entry takes the repo chip lock itself, so
# this script holds nothing. Deadline discipline (VERDICT r4 item 8):
# every job checks fit against DEADLINE_EPOCH before launching.
set -u
cd /root/repo
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -d "2026-08-21 10:45 UTC" +%s)}

mins_left() { echo $(( ($DEADLINE_EPOCH - $(date +%s)) / 60 )); }

probe() {
  timeout 120 python -c "import jax, jax.numpy as j; print(float(j.ones(3).sum()))" >/dev/null 2>&1
}

echo "$(date -u) queue start, $(mins_left) min to deadline"
until probe; do
  echo "$(date -u) chip not ready (claim wedged?), retrying in 120s"
  sleep 120
  if [ "$(mins_left)" -lt 60 ]; then echo "deadline too close, abort"; exit 3; fi
done
echo "$(date -u) chip ready"

run_if_fits() {  # expected_min name cmd...
  local need=$1; shift; local name=$1; shift
  if [ "$(mins_left)" -lt "$need" ]; then
    echo "$(date -u) SKIP $name (needs ${need}m, $(mins_left)m left)"; return 1
  fi
  echo "$(date -u) START $name ($(mins_left)m left)"
  "$@" > "logs/queue_r5_${name}.log" 2>&1
  echo "$(date -u) DONE $name rc=$?"
}

# 1+2: flagship evidence — two clean full-schedule runs, different seeds,
# with the proven per-level CP path (stacked-CP is benched separately)
NEURALSIM_CP_STACKED=0 run_if_fits 80 demo_s42 \
  timeout 6000 python scripts/run_waymo_demo.py 6000 --seed 42
NEURALSIM_CP_STACKED=0 run_if_fits 80 demo_s7 \
  timeout 6000 python scripts/run_waymo_demo.py 6000 --seed 7
# 3: official bench with the stacked-CP encoding (fresh compile)
run_if_fits 40 bench_stacked timeout 2200 python bench.py
# 4: stacked-vs-per-level quality guardrail (600-iter A/B)
run_if_fits 40 ab_stacked timeout 2200 python scripts/quality_ab_r2.py
NEURALSIM_CP_STACKED=0 run_if_fits 40 ab_perlevel \
  timeout 2200 python scripts/quality_ab_r2.py
# 5: multi-object ladder refresh (VERDICT item 9)
run_if_fits 35 ladder timeout 2000 python scripts/bench_multi.py
echo "$(date -u) QUEUE COMPLETE"
