#!/usr/bin/env bash
# Probe the TPU relay until it answers, then run the queued validation.
#
# Usage: bash scripts/tpu_relay_watch.sh [max_hours]
# Probes jax.devices() with a bounded timeout every PROBE_INTERVAL seconds.
# On the first healthy probe, runs scripts/tpu_validation_queue.sh and exits
# with its status. Exits 2 if the relay never answers within max_hours.
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-10}"
PROBE_INTERVAL="${PROBE_INTERVAL:-300}"
PROBE_TIMEOUT="${PROBE_TIMEOUT:-120}"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
mkdir -p /tmp/tpuval

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout "$PROBE_TIMEOUT" python - <<'EOF' >/tmp/tpuval/probe.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
print("healthy:", d)
EOF
  then
    echo "[watch] relay healthy at $(date -u +%FT%TZ); running validation queue"
    bash scripts/tpu_validation_queue.sh
    exit $?
  fi
  echo "[watch] relay down at $(date -u +%FT%TZ); retry in ${PROBE_INTERVAL}s"
  sleep "$PROBE_INTERVAL"
done
echo "[watch] relay never answered within ${MAX_HOURS}h"
exit 2
