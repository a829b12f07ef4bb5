#!/usr/bin/env bash
# Round-4 hardware battery: bitap kernel measurements + headline bench.
#
# Probes the TPU relay; when it answers, runs the round-4 measurement
# sequence in order, logging everything.  Run from the repo root:
#
#   bash experiments/hw_battery_r4.sh [logfile]
#
# Order matters: the bisect2 staged-vs-copy3d discriminator first (it
# decides whether the production engine needs a stage-time relayout),
# then the production engine rates, then the headline bench.
set -u
LOG="${1:-/tmp/hw_battery_r4.log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform in ("tpu", "axon")
import jax.numpy as jnp
assert int(jnp.zeros(8).sum()) == 0
EOF
}

echo "=== hw_battery_r4 $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

run env PROBE_MB=32 python experiments/tpu_bitap_bisect2.py
run env PROBE_MB=32 python experiments/tpu_dense_interleave.py
run env PROBE_MB=128 python experiments/tpu_bitap_prod.py
run python bench.py
echo "=== battery done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
