#!/usr/bin/env bash
# Round-5 hardware battery: the repeatable measurement sequence behind
# this round's perf claims.  Run from the repo root:
#
#   bash experiments/hw_battery_r5.sh [logfile]
#
# Sequence:
#   1. the full hardware correctness lane (AMT_TPU_TESTS=1, 9 tests:
#      dense/comb16/comb32/extraction/fused + bitap V=1/2 with the paired
#      >=1.2x-dense floor, CI bitap trapless/embedded/trap-firing with
#      localized recovery, filter screen, comb16 chain parity);
#   2. the hit-sparse containsAny filter vs comb16 sticky paired A/B;
#   3. the CI bitap hi-pairs vs forced-2-row paired A/B (+ trap-firing
#      exactness);
#   4. the comb16 compare-chain A/B (expected NEGATIVE: chains slower at
#      26 boundaries — the recorded crossover law);
#   5. the headline bench (auto-dispatch; emits the paired dense-control
#      weather gauge into its JSON).
set -u
LOG="${1:-experiments/logs/hw_battery_r5.log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform in ("tpu", "axon")
import jax.numpy as jnp
assert int(jnp.zeros(8).sum()) == 0
EOF
}

echo "=== hw_battery_r5 $(date -u +%FT%TZ) ===" | tee -a "$LOG"
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

run env AMT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
run env PROBE_MB=64 python experiments/tpu_filter_contains.py
run env PROBE_MB=16 python experiments/tpu_bitap_ci_hipairs2.py
run env PROBE_MB=64 python experiments/tpu_c16_chains.py
run python bench.py
echo "=== battery done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
