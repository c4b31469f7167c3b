#!/bin/bash
# Round-5 queue supervisor: while science arms remain and the round window
# is open, relaunch the queue whenever (a) it is not running and (b) the
# axon device port (8082) accepts connections again (it refuses while the
# tunnel's external peer is down).  flock guarantees a single queue.
set -u
REPO=/root/repo
DEADLINE_EPOCH="$1"        # stop launching after this time
LOCK=/tmp/q5_queue.lock

log() { echo "[super5 $(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r5.log; }

arms_remaining() {
  [ ! -f "$REPO/.science/output/synthetic/convergence_20k_r5_default/quant_eval.json" ] && return 0
  [ ! -f "$REPO/.science/output/synthetic/llff_parallax_r5/quant.json" ] && return 0
  [ ! -f "$REPO/output/synthetic/barf_convergence_20k_r5/quant.json" ] && return 0
  [ ! -f "$REPO/.science/output/synthetic/convergence_20k_r5_appk128/quant.json" ] && return 0
  return 1
}

tunnel_up() {
  local code
  code=$(timeout 8 curl -s -o /dev/null -w "%{http_code}" \
         http://127.0.0.1:8082/ 2>/dev/null)
  [ -n "$code" ] && [ "$code" != "000" ]
}

while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; do
  if ! arms_remaining; then log "all arms done; exiting"; exit 0; fi
  if [ -f /tmp/q5_stop ]; then log "stop flag; supervisor exiting"; exit 0; fi
  if flock -n "$LOCK" -c true 2>/dev/null; then   # queue not running
    if tunnel_up; then
      log "tunnel answers; (re)launching queue"
      flock -n "$LOCK" bash "$REPO/scripts/run_round5_queue.sh" \
        >> /tmp/queue_r5_driver.log 2>&1
      log "queue pass finished"
    fi
  fi
  sleep 120
done
log "deadline reached; supervisor exiting"
