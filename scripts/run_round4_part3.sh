#!/bin/bash
# Round-4 science queue, part 3 (supersedes part 2, which aborted on the
# dense-appearance NaN — fixed by the division-free exclusive_cumprod VJP,
# docs/DESIGN_NOTES.md round-4 NaN section).
#
# Protocol notes:
#   * Bisect arms pin --tpu.blur_mask_compact! : the round-4 appk64 arm
#     ran BEFORE the blur-mask feature existed, and the bisect must differ
#     ONLY in the appearance cap.
#   * The appk64_blurmask arm is the VALIDATION run for the new default:
#     same protocol as appk64, feature ON — quality parity + in-situ
#     wall-clock delta.
#   * Every arm respects DEADLINE (epoch seconds): an arm whose timeout
#     cannot fit before the deadline is skipped, so the driver's
#     end-of-round bench.py is never claim-blocked by a leftover arm.
set -u
REPO=/root/repo
WT=$REPO/.science
cd "$WT"
export JTF_SCENE_CACHE=$REPO/output/.scene_cache
export JTF_COMPILE_CACHE=$REPO/.jax_cache
DEADLINE="${DEADLINE:-$(( $(date +%s) + 9000 ))}"

log() { echo "[queue4c $(date +%H:%M:%S)] $*" | tee -a /tmp/queue_r4c.log; }

run_arm() {  # run_arm <timeout_s> <logfile> <cmd...>
  local t="$1" lg="$2"; shift 2
  local now rem
  now=$(date +%s); rem=$(( DEADLINE - now - 120 ))
  if [ "$rem" -lt 600 ]; then log "SKIP (deadline): $*"; return 99; fi
  [ "$t" -gt "$rem" ] && t="$rem"
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
  run_arm 7000 /tmp/q4_20k_appknone.log \
    python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k! --tpu.blur_mask_compact! \
      --name=convergence_20k_r4_appknone
  collect synthetic/convergence_20k_r4_appknone
fi
if [ -f "$WT/output/synthetic/convergence_20k_r4_appknone/model.ckpt.npz" ]; then
  run_arm 2400 /tmp/q4_eval_appknone.log \
    python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k! --tpu.blur_mask_compact! \
      --name=convergence_20k_r4_appknone
  collect synthetic/convergence_20k_r4_appknone
fi

# 2. LLFF/NDC on the PARALLAX scene (round-4 recovery demonstration).
#    NDC: blur-mask culling is auto-disabled (trainer ndc guard).
if [ ! -f "$WT/output/synthetic/llff_parallax_r4/quant.json" ]; then
  run_arm 9000 /tmp/q4_llff_parallax.log \
    python train.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
      --name=llff_parallax_r4
  collect synthetic/llff_parallax_r4
fi
if [ -f "$WT/output/synthetic/llff_parallax_r4/model.ckpt.npz" ]; then
  run_arm 2400 /tmp/q4_eval_parallax.log \
    python evaluate.py --yaml=configs/bat_synthetic_llff_parallax.yaml \
      --name=llff_parallax_r4
  collect synthetic/llff_parallax_r4
fi

# 3. Blur-mask validation arm: appk64 protocol + the new default ON.
if [ ! -f "$WT/output/synthetic/convergence_20k_r4_appk64_blurmask/quant.json" ]; then
  run_arm 4000 /tmp/q4_20k_blurmask.log \
    python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k_auto! --name=convergence_20k_r4_appk64_blurmask
  collect synthetic/convergence_20k_r4_appk64_blurmask
fi
if [ -f "$WT/output/synthetic/convergence_20k_r4_appk64_blurmask/model.ckpt.npz" ]; then
  run_arm 2400 /tmp/q4_eval_blurmask.log \
    python evaluate.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
      --tpu.app_k_auto! --name=convergence_20k_r4_appk64_blurmask
  collect synthetic/convergence_20k_r4_appk64_blurmask
fi

# 4. appk128, lowest priority.
[ -f /tmp/q4_skip_appk128 ] && { log "appk128 skipped by flag"; log "queue complete"; exit 0; }
run_arm 6000 /tmp/q4_20k_appk128.log \
  python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
    --tpu.app_k=128 --tpu.app_k_auto! --tpu.blur_mask_compact! \
    --name=convergence_20k_r4_appk128
collect synthetic/convergence_20k_r4_appk128

log "queue complete"
