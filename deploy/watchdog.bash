#!/bin/bash
# Watchdog: restart the stack when the radar stops producing maps.
#
# Same contract as the reference's cron restart script
# (script/blah2_rspduo_restart.bash): poll /api/map; if the response is not
# JSON or its timestamp is older than 60 s, restart the compose stack.
# Install via deploy/crontab.txt (every 5 minutes).

set -u

COMPOSE_FILE="${COMPOSE_FILE:-/opt/blah2_tpu/docker-compose.yml}"
API="${API:-127.0.0.1:3000}"
MAX_AGE_S="${MAX_AGE_S:-60}"

BODY=$(curl -s --max-time 5 "$API/api/map" | head -c 64)
FIRST_CHAR=${BODY:0:1}
# map JSON starts {"timestamp":<ms>,... — extract the 13-digit timestamp
TS_MS=$(echo "$BODY" | grep -oE '"timestamp":[0-9]+' | grep -oE '[0-9]+')
NOW_S=$(date +%s)
AGE_S=$(( NOW_S - ${TS_MS:-0} / 1000 ))

if [[ "$FIRST_CHAR" != "{" ]] || [[ $AGE_S -gt $MAX_AGE_S ]]; then
  docker compose -f "$COMPOSE_FILE" down
  # If an SDR API service wedged the USB stack, restart it too (RspDuo
  # deployments; harmless elsewhere).
  systemctl restart sdrplay.service 2>/dev/null
  docker compose -f "$COMPOSE_FILE" up -d
  echo "blah2_tpu watchdog: restarted (first_char='$FIRST_CHAR' age=${AGE_S}s)"
fi
