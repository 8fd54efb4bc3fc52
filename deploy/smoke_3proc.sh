#!/usr/bin/env bash
# Smoke-test the 3-process topology of docker-compose-3proc.yml WITHOUT
# docker: boots the same two python processes with the same wiring (a
# standalone API with TCP ingest + web console, and a radar process with
# --no-api --tcp-egress streaming the six JSON products over localhost
# TCP), then curls the REST surface. The compose file adds only
# containerisation and the nginx proxy around exactly this.
#
#   bash deploy/smoke_3proc.sh [config]   # default config/config-synthetic.yml
#
# Exits 0 iff the API serves a non-empty map, detection, timing and the
# web console index through the same process that ingested them over TCP.
set -u
cd "$(dirname "$0")/.."
CFG="${1:-config/config-synthetic.yml}"
PORT=$(python -c "import yaml;print(yaml.safe_load(open('$CFG'))['network']['ports']['api'])")
# CPU by default: dev hosts may pin JAX_PLATFORMS to a remote TPU plugin
# whose registration we just dropped by clearing PYTHONPATH. Override
# with BLAH2_SMOKE_PLATFORM for a real-device smoke.
export PYTHONPATH=
export JAX_PLATFORMS="${BLAH2_SMOKE_PLATFORM:-cpu}"

python -m blah2_tpu.net.api -c "$CFG" & API_PID=$!
sleep 1
python -m blah2_tpu.runtime.cli -c "$CFG" --no-api --tcp-egress \
  --cpis 3 --quiet & RADAR_PID=$!

cleanup() {
  status=$?
  kill "$RADAR_PID" "$API_PID" 2>/dev/null
  wait "$RADAR_PID" "$API_PID" 2>/dev/null
  exit $status
}
trap cleanup EXIT

fail=0
deadline=$((SECONDS + 180))
until curl -sf "http://127.0.0.1:$PORT/api/map" | grep -q nRows; do
  if [ $SECONDS -ge $deadline ]; then echo "FAIL: no map product"; fail=1; break; fi
  if ! kill -0 "$RADAR_PID" 2>/dev/null && \
     ! curl -sf "http://127.0.0.1:$PORT/api/map" | grep -q nRows; then
    # radar already exited after --cpis 3; give ingest a moment then retry once
    sleep 2
  fi
  sleep 1
done

check() {
  if curl -sf "http://127.0.0.1:$PORT$1" | grep -q "$2"; then
    echo "ok  $1"
  else
    echo "FAIL $1 (wanted: $2)"; fail=1
  fi
}
if [ $fail -eq 0 ]; then
  check /api/map nRows
  check /api/detection timestamp
  check /api/timing nCpi
  check /api/iqdata spectrum
  check /stash/map nRows
  check / "<html"
  check /favicon/favicon-32x32.png PNG
fi
[ $fail -eq 0 ] && echo "3proc smoke OK" || echo "3proc smoke FAILED"
exit $fail
