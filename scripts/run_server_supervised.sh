#!/usr/bin/env bash
# Supervised server runner: restarts the miotts-tpu server when the device
# link wedges (observed failure mode on relay-attached TPU hosts: every
# in-flight device call blocks in futex-wait forever; /mio/health reports
# device_stalled=true once no chunk completes for MIOTTS_DEVICE_STALL_S).
#
# A wedged relay usually needs the PROCESS to restart (fresh PJRT client);
# with the persistent compile cache + packed weight upload a restart is
# ~70-140 s back to listening, which beats an indefinite hang.
#
# Usage: scripts/run_server_supervised.sh --port 18089 [server args...]
# Env: MIOTTS_SUPERVISE_POLL_S (default 30), MIOTTS_SUPERVISE_STALLS
#      (consecutive stalled polls before restart, default 4),
#      MIOTTS_SUPERVISE_MAX_RESTARTS (default unlimited).
set -uo pipefail
cd "$(dirname "$0")/.."

PORT=18089
args=("$@")
for ((i = 0; i < ${#args[@]}; i++)); do
  if [[ "${args[$i]}" == "--port" && $((i + 1)) -lt ${#args[@]} ]]; then
    PORT="${args[$((i + 1))]}"
  fi
done
POLL="${MIOTTS_SUPERVISE_POLL_S:-30}"
NEED="${MIOTTS_SUPERVISE_STALLS:-4}"
MAX="${MIOTTS_SUPERVISE_MAX_RESTARTS:-0}"

pid=""
trap '[[ -n "$pid" ]] && kill -TERM "$pid" 2>/dev/null' EXIT INT TERM

restarts=0
while :; do
  echo "supervisor: starting server (restart #$restarts)" >&2
  python -m miotts_tpu.serving.server "$@" &
  pid=$!
  stalls=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep "$POLL"
    health="$(curl -s -m 5 "localhost:$PORT/mio/health" || true)"
    if [[ "$health" == *'"device_stalled": true'* ]]; then
      stalls=$((stalls + 1))
      echo "supervisor: device_stalled ($stalls/$NEED)" >&2
    else
      stalls=0
    fi
    if (( stalls >= NEED )); then
      echo "supervisor: device link wedged — restarting the server" >&2
      kill -TERM "$pid" 2>/dev/null
      # a wedged PJRT call can ignore SIGTERM's graceful drain; escalate
      for _ in $(seq 1 12); do kill -0 "$pid" 2>/dev/null || break; sleep 5; done
      kill -KILL "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  restarts=$((restarts + 1))
  if (( MAX > 0 && restarts >= MAX )); then
    echo "supervisor: restart limit reached, exiting" >&2
    exit 1
  fi
  sleep 2
done
