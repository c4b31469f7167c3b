#!/bin/bash
# Round-5 science queue (VERDICT round-4 #3, #4, #6):
#   A. convergence_20k with the SHIPPED DEFAULTS (app_k_auto + blur_mask_compact
#      on, no overrides) — the validation arm for the default config that
#      round 4 never completed (its blurmask arm was killed by round end at
#      it 5750).  Comparability: runs from the PINNED .science worktree
#      (5ae9bb2, the same commit as the r4 appk64/appknone bisect arms).
#   B. LLFF/NDC parallax demonstration (the r4 arm froze pre-it-0; silent
#      tunnel-claim hang — watchdog below addresses exactly that mode).
#   C. appk128 bisect arm (completes the committed round-4 bisect design).
#   D. BARF-engine 20k convergence run (runs from the MAIN repo; it needs
#      the round-5 barf_synthetic config that the pinned commit lacks).
#
# Failure-mode hardening (carried from round 4 + new):
#   * no `set -e`; every arm records rc and the queue continues.
#   * evidence collected into docs/evidence/ immediately after each arm.
#   * >=60 s claim-release gap between chip processes (the r4 hang followed
#     a 20 s gap).
#   * WATCHDOG: an arm whose process CPU time stops growing for
#     $STALL_S seconds is wedged (r4 silent-hang mode: frozen before it 0,
#     no error, no device progress) — kill that exact PID (never a
#     pattern), wait 90 s, retry ONCE.
#   * stop flag: `touch /tmp/q5_stop` finishes the current arm then exits,
#     freeing the chip for perf work / the driver's bench.
set -u
REPO=/root/repo
WT=$REPO/.science
export JTF_SCENE_CACHE=$REPO/output/.scene_cache
export JTF_COMPILE_CACHE=$REPO/.jax_cache
STALL_S=420

log() { echo "[queue5 $(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r5.log; }

cpu_time() {  # total jiffies (utime+stime) of PID $1, 0 if gone
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

run_arm() {  # run_arm <dir> <timeout_s> <logfile> <cmd...>
  local dir="$1" t="$2" lg="$3"; shift 3
  # hard chip-release deadline: the driver's end-of-round bench needs the
  # chip free; clamp every arm's timeout to the remaining window and
  # refuse to start with <3 min left
  local hard_end; hard_end="${Q5_HARD_END:-$(date -d 07:10 +%s)}"
  local remain=$((hard_end - $(date +%s)))
  [ "$remain" -lt 180 ] && { log "skip (past hard chip deadline): $*"; return 124; }
  [ "$t" -gt "$remain" ] && t=$remain
  local tries=0
  while [ $tries -lt 2 ]; do
    tries=$((tries + 1))
    log "start (try $tries): $* (timeout ${t}s, dir $dir)"
    ( cd "$dir" && exec "$@" ) > "$lg" 2>&1 &
    local pid=$!
    local start=$(date +%s) last_cpu=0 last_change=$(date +%s)
    local rc=-1
    while true; do
      if ! kill -0 "$pid" 2>/dev/null; then
        wait "$pid"; rc=$?; break
      fi
      local now=$(date +%s)
      if [ $((now - start)) -ge "$t" ]; then
        log "TIMEOUT: killing pid $pid"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null; rc=124; break
      fi
      local cpu; cpu=$(cpu_time "$pid")
      if [ "$cpu" -gt "$last_cpu" ]; then
        last_cpu=$cpu; last_change=$now
      elif [ $((now - last_change)) -ge "$STALL_S" ]; then
        log "STALL: pid $pid cpu-time frozen ${STALL_S}s; killing"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null; rc=125; break
      fi
      sleep 30
    done
    log "done rc=$rc: $*"
    sleep 60   # claim-release gap (r4 memory: 20 s was too short)
    [ $rc -ne 125 ] && return $rc   # only the stall mode retries
    log "retrying after stall"
  done
  return 125
}

collect() {  # collect <dir> <run>
  local dir="$1" run="$2"
  mkdir -p "$REPO/docs/evidence/$run"
  for f in log.jsonl options.json quant.json quant.txt quant_eval.json \
           quant_pose.txt poses.png; do
    [ -f "$dir/output/$run/$f" ] && cp "$dir/output/$run/$f" \
        "$REPO/docs/evidence/$run/"
  done
  log "collected $run"
}

stop_check() { [ -f /tmp/q5_stop ] && { log "stop flag; exiting"; exit 0; }; }

# ---- A. shipped-defaults validation arm ------------------------------------
if [ ! -f "$WT/output/synthetic/convergence_20k_r5_default/quant.json" ]; then
  run_arm "$WT" 5400 /tmp/q5_default.log \
    python -u train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --name=convergence_20k_r5_default
  collect "$WT" synthetic/convergence_20k_r5_default
  if [ -f "$WT/output/synthetic/convergence_20k_r5_default/model.ckpt.npz" ]; then
    run_arm "$WT" 2700 /tmp/q5_eval_default.log \
      python -u evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
        --name=convergence_20k_r5_default
    collect "$WT" synthetic/convergence_20k_r5_default
  fi
fi
stop_check

# ---- P0. app_k_dense_only decision measurement (fast, ~8 min) --------------
# compacted step at app_k=192 (auto-raised two-stage) vs app_k=0 (dense
# fused appearance over compacted K): decides tpu.app_k_dense_only's
# default + the bench headline billing.  Runs before the long arms so a
# short tunnel window still captures it.
if [ ! -f /tmp/p5_appk_decision.log ]; then
  run_arm "$REPO" 900 /tmp/p5_appk192.log \
    python -u scripts/phase_profile.py compact res=400 app_k=192 notrace=1
  run_arm "$REPO" 900 /tmp/p5_appk0.log \
    python -u scripts/phase_profile.py compact res=400 app_k=0 notrace=1
  { grep -h "ms/step" /tmp/p5_appk192.log /tmp/p5_appk0.log \
      || true; } > /tmp/p5_appk_decision.log
  log "app_k decision measurements captured"
fi
stop_check

# ---- B. LLFF/NDC parallax demonstration ------------------------------------
# time gate: the train+eval pair needs ~3.3 h; starting it into a shorter
# window (late tunnel recovery) would burn the chip time that the BARF +
# appk128 arms COULD finish — skip B when started too late (round-5 round
# ends ~07:45; 04:30 leaves the pair just enough).
B_LATE="${Q5_B_DEADLINE:-$(date -d 04:00 +%s 2>/dev/null || echo 0)}"
if [ "$(date +%s)" -gt "$B_LATE" ] 2>/dev/null; then
  log "arm B skipped: past its start deadline (late tunnel window)"
elif [ ! -f "$WT/output/synthetic/llff_parallax_r5/quant.json" ]; then
  run_arm "$WT" 9500 /tmp/q5_parallax.log \
    python -u train.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
      --name=llff_parallax_r5
  collect "$WT" synthetic/llff_parallax_r5
  if [ -f "$WT/output/synthetic/llff_parallax_r5/model.ckpt.npz" ]; then
    run_arm "$WT" 2700 /tmp/q5_eval_parallax.log \
      python -u evaluate.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
        --name=llff_parallax_r5
    collect "$WT" synthetic/llff_parallax_r5
  fi
fi
stop_check

# ---- D. BARF-engine convergence run (main repo; round-5 config) ------------
if [ -f "$REPO/configs/barf_synthetic_convergence_20k.yaml" ] && \
   [ ! -f "$REPO/output/synthetic/barf_convergence_20k_r5/quant.json" ]; then
  run_arm "$REPO" 9000 /tmp/q5_barf.log \
    python -u train.py --yaml=configs/barf_synthetic_convergence_20k.yaml \
      --name=barf_convergence_20k_r5
  collect "$REPO" synthetic/barf_convergence_20k_r5
  if [ -f "$REPO/output/synthetic/barf_convergence_20k_r5/model.ckpt.npz" ]; then
    run_arm "$REPO" 2700 /tmp/q5_eval_barf.log \
      python -u evaluate.py --yaml=configs/barf_synthetic_convergence_20k.yaml \
        --name=barf_convergence_20k_r5
    collect "$REPO" synthetic/barf_convergence_20k_r5
  fi
fi
stop_check

# ---- C. appk128 bisect arm -------------------------------------------------
if [ ! -f "$WT/output/synthetic/convergence_20k_r5_appk128/quant.json" ]; then
  run_arm "$WT" 5400 /tmp/q5_appk128.log \
    python -u train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k=128 --tpu.app_k_auto! --name=convergence_20k_r5_appk128
  collect "$WT" synthetic/convergence_20k_r5_appk128
  if [ -f "$WT/output/synthetic/convergence_20k_r5_appk128/model.ckpt.npz" ]; then
    run_arm "$WT" 1800 /tmp/q5_eval_appk128.log \
      python -u evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
        --tpu.app_k=128 --tpu.app_k_auto! --name=convergence_20k_r5_appk128
    collect "$WT" synthetic/convergence_20k_r5_appk128
  fi
fi

log "queue complete"
