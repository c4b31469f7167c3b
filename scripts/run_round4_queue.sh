#!/bin/bash
# Round-4 science queue (VERDICT round-3 #1, #5): finish the round-3 bisect
# and the LLFF no-noise demonstration, with the failure modes of the round-3
# queue fixed (ADVICE round-3, medium):
#   * NO `set -e`: one arm's failure or timeout (rc 124) must not eat the
#     rest of the queue — every arm captures its rc and continues.
#   * Timeouts sized from MEASURED step rates (appknone ran 10.5k its in
#     4200 s = 0.40 s/it -> 20k needs ~8200 s + compiles, budget 12000).
#   * Evidence is copied into docs/evidence/ immediately after each arm, so
#     a later failure cannot orphan a completed run's artifacts.
#   * All arms run from a PINNED git worktree (.science, detached at the
#     round-4 science commit) so perf work in the main tree mid-queue
#     cannot change the code under the bisect; the bisect arms (appk64 /
#     appk128 / appknone) therefore differ ONLY in the appearance cap.
# The axon TPU claim is exclusive per python process; arms run sequentially.
set -u
REPO=/root/repo
WT=$REPO/.science
cd "$WT"
export JTF_SCENE_CACHE=$REPO/output/.scene_cache
export JTF_COMPILE_CACHE=$REPO/.jax_cache   # share the warm XLA cache

log() { echo "[queue4 $(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r4.log; }

run_arm() {  # run_arm <timeout_s> <logfile> <cmd...>
  local t="$1" lg="$2"; shift 2
  log "start: $* (timeout ${t}s)"
  timeout "$t" "$@" > "$lg" 2>&1
  local rc=$?
  log "done rc=$rc: $*"
  sleep 30   # let the TPU claim release cleanly between processes
  return $rc
}

collect() {  # copy the evidentiary subset into the MAIN repo's docs/evidence
  local run="$1"
  mkdir -p "$REPO/docs/evidence/$run"
  for f in log.jsonl options.json quant.json quant.txt quant_eval.json \
           quant_pose.txt poses.png; do
    [ -f "$WT/output/$run/$f" ] && cp "$WT/output/$run/$f" \
        "$REPO/docs/evidence/$run/"
  done
  log "collected $run"
}

# Usage: run_round4_queue.sh [part1|part2]   (default: both)
# part1 = colmap eval + appk64 rerun (~1.5 h); part2 = appknone + appk128
# (~3.7 h).  The split leaves a chip window between them for perf
# measurement bursts (VERDICT #2/#3) without starving the science.
PART="${1:-all}"

# 0. If the leftover round-3 watcher's colmap arm is still running, wait.
while pgrep -f "name=llff_ref_r3_colmap" > /dev/null 2>&1; do
  log "waiting for llff_ref_r3_colmap (round-3 watcher) to finish"
  sleep 120
done

if [ "$PART" = "part2" ]; then goto_part2=1; else goto_part2=0; fi
if [ "$goto_part2" = "0" ]; then

# 1. Eval of the no-noise LLFF arm (reference protocol: test-time
#    photometric pose optim per held-out view, bat.py:265-292).  The
#    checkpoint was written by the round-3 watcher into the shared output/.
run_arm 3600 /tmp/q4_eval_colmap.log \
  python evaluate.py --yaml=configs/bat_synthetic_llff_ref.yaml \
    --camera.noise=1e-8 --name=llff_ref_r3_colmap
collect synthetic/llff_ref_r3_colmap

# 2. Bisect baseline RE-RUN on round-4 code (the r3 appk64 arm ran on
#    round-3 code; the bisect must hold code fixed across its own arms)
run_arm 4800 /tmp/q4_20k_appk64.log \
  python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k_auto! --name=convergence_20k_r4_appk64
collect synthetic/convergence_20k_r4_appk64
run_arm 2400 /tmp/q4_eval_appk64.log \
  python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k_auto! --name=convergence_20k_r4_appk64
collect synthetic/convergence_20k_r4_appk64

fi  # end part1
if [ "$PART" = "part1" ]; then log "part1 complete"; exit 0; fi

# 3. LLFF/NDC on the PARALLAX scene (round-4): the reference-faithful
#    protocol on a capture with LLFF-like depth structure — the recovery
#    demonstration for the forward-facing drift (the colmap arm documents
#    the failure mode on the depth-poor `facing` scene).  ~2.3 h measured
#    from the colmap arm's rates (big-batch phase ~2.2 s/it to it 1200,
#    then ~0.35 s/it) + ~10 min GT render; budget 16000.
run_arm 16000 /tmp/q4_llff_parallax.log \
  python train.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
    --name=llff_parallax_r4
collect synthetic/llff_parallax_r4

run_arm 3600 /tmp/q4_eval_parallax.log \
  python evaluate.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
    --name=llff_parallax_r4
collect synthetic/llff_parallax_r4

# 4. Bisect arm: app_k disabled (dense appearance), full 20k this time
run_arm 12000 /tmp/q4_20k_appknone.log \
  python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k! --name=convergence_20k_r4_appknone
collect synthetic/convergence_20k_r4_appknone
run_arm 2400 /tmp/q4_eval_appknone.log \
  python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k! --name=convergence_20k_r4_appknone
collect synthetic/convergence_20k_r4_appknone

# 5. Bisect arm: app_k=128 (between the 64 baseline and dense).  Lowest
#    priority — the bisect concludes from appk64 vs appknone; skip by
#    touching /tmp/q4_skip_appk128 if the round is short on chip time.
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
