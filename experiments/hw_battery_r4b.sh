#!/usr/bin/env bash
# Round-4b hardware battery: CI bitap + mid-tier crossover + headline bench.
#
# Probes the TPU relay; when it answers, runs the measurement sequence in
# order, logging everything.  Run from the repo root:
#
#   bash experiments/hw_battery_r4b.sh [logfile]
#
# Sequence: CI bitap paired rates (trapless V=1 and trap-bearing V=1+trap
# vs the composed dense kernel), then the mid-tier word-budget crossover
# (bitap V=4..8 vs the AMT_BITAP=0 ladder dispatch), then the headline
# bench (auto-picks the fastest kernel).
set -u
LOG="${1:-experiments/logs/hw_battery_r4b.log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform in ("tpu", "axon")
import jax.numpy as jnp
assert int(jnp.zeros(8).sum()) == 0
EOF
}

echo "=== hw_battery_r4b $(date -u +%FT%TZ) ===" | tee -a "$LOG"
until probe; do
  echo "relay down, retrying in 240s ($(date -u +%T))" | tee -a "$LOG"
  sleep 240
done
echo "relay UP ($(date -u +%T)); running battery" | tee -a "$LOG"

run() {
  echo "--- $* ($(date -u +%T)) ---" | tee -a "$LOG"
  timeout 3600 "$@" >>"$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

run env PROBE_MB=32 python experiments/tpu_bitap_ci.py
run env PROBE_MB=32 python experiments/tpu_bitap_midtier.py
run python bench.py
echo "=== battery done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
