#!/usr/bin/env bash
# Hardware measurement battery (VERDICT r2 item 9: the relay-recovery
# procedure, in-repo and reproducible).
#
# Probes the TPU relay; when it answers, runs the full battery in order
# and appends everything to the log.  Run from the repo root:
#
#   bash experiments/hw_battery.sh [logfile]
#
# Battery contents (each independently skippable by editing the list):
#   1. experiments/tpu_r2_measure.py  — kernel-family rates + grouped fused
#   2. bench.py                       — the driver's headline metric
#   3. bench/configs.py sweep         — reference-config rates w/ parity gates
#   4. AMT_TPU_TESTS=1 hardware lane  — opt-in pytest on the chip
#   5. experiments/tpu_streaming_check.py — out-of-core device streaming
#   6. experiments/tpu_bits_profile.py — extraction stage breakdown
set -u
LOG="${1:-/tmp/hw_battery.log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform in ("tpu", "axon")
import jax.numpy as jnp
assert int(jnp.zeros(8).sum()) == 0
EOF
}

echo "=== hw_battery $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

run python experiments/tpu_r2_measure.py
run python bench.py
run python -m alfred_margaret_tpu.bench.configs
run env AMT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
run python experiments/tpu_adopt_check.py
run python experiments/tpu_streaming_check.py
run python experiments/tpu_bits_profile.py
run python experiments/tpu_bits_profile.py --hit-fraction 0.0003 --size-mb 128 --no-short
echo "=== battery complete $(date -u +%FT%TZ) ===" | tee -a "$LOG"
