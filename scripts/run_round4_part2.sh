#!/bin/bash
# Round-4 science queue, part 2 — reordered vs run_round4_queue.sh:
#   1. appknone bisect arm FIRST (VERDICT round-3 #1/#3: the arm that
#      actually attributes the 6 dB app_k regression), then its eval.
#   2. parallax LLFF/NDC demonstration second (its claim — poses stay at
#      the COLMAP optimum — is readable from the training log at any
#      truncation point, so it tolerates an end-of-round cutoff; the
#      appknone eval PSNR does not).
#   3. appk128 arm last, only if wall clock remains.
# Timeouts re-sized from MEASURED round-4 rates: the appk64 re-run did
# 20k its in 1655 s (0.083 s/it); dense appearance (appknone) is bounded
# by the round-3 measurement 0.40 s/it and the round-4 speedups -> budget
# 9000 s.  Evidence is collected into the MAIN repo immediately after
# each arm (and this script is safe to re-run: completed arms are skipped
# via their quant.json marker).
set -u
REPO=/root/repo
WT=$REPO/.science
cd "$WT"
export JTF_SCENE_CACHE=$REPO/output/.scene_cache
export JTF_COMPILE_CACHE=$REPO/.jax_cache

log() { echo "[queue4b $(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r4b.log; }

run_arm() {  # run_arm <timeout_s> <logfile> <cmd...>
  local t="$1" lg="$2"; shift 2
  log "start: $* (timeout ${t}s)"
  timeout "$t" "$@" > "$lg" 2>&1
  local rc=$?
  log "done rc=$rc: $*"
  sleep 20
  return $rc
}

collect() {
  local run="$1"
  mkdir -p "$REPO/docs/evidence/$run"
  for f in log.jsonl options.json quant.json quant.txt quant_eval.json \
           quant_pose.txt poses.png; do
    [ -f "$WT/output/$run/$f" ] && cp "$WT/output/$run/$f" \
        "$REPO/docs/evidence/$run/"
  done
  log "collected $run"
}

# 1. Bisect arm: dense appearance (no app_k cap), full 20k.
if [ ! -f "$WT/output/synthetic/convergence_20k_r4_appknone/quant.json" ]; then
  run_arm 9000 /tmp/q4_20k_appknone.log \
    python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k! --name=convergence_20k_r4_appknone
  collect synthetic/convergence_20k_r4_appknone
fi
run_arm 2400 /tmp/q4_eval_appknone.log \
  python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k! --name=convergence_20k_r4_appknone
collect synthetic/convergence_20k_r4_appknone

# 2. LLFF/NDC on the PARALLAX scene (round-4 recovery demonstration).
run_arm 9000 /tmp/q4_llff_parallax.log \
  python train.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
    --name=llff_parallax_r4
collect synthetic/llff_parallax_r4
run_arm 2400 /tmp/q4_eval_parallax.log \
  python evaluate.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
    --name=llff_parallax_r4
collect synthetic/llff_parallax_r4

# 3. appk128, lowest priority.
[ -f /tmp/q4_skip_appk128 ] && { log "appk128 skipped by flag"; log "queue complete"; exit 0; }
run_arm 6000 /tmp/q4_20k_appk128.log \
  python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k=128 --tpu.app_k_auto! --name=convergence_20k_r4_appk128
collect synthetic/convergence_20k_r4_appk128
run_arm 2400 /tmp/q4_eval_appk128.log \
  python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k=128 --tpu.app_k_auto! --name=convergence_20k_r4_appk128
collect synthetic/convergence_20k_r4_appk128

log "queue complete"
