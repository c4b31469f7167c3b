#!/bin/bash
# Round-3 convergence queue (VERDICT #3 + #4 + #6), sequential — the axon
# TPU claim is exclusive per python process (docs/BENCH_NOTES.md), so runs
# must never overlap.  Each run is under `timeout` so a hang cannot eat the
# round; the driver's end-of-round bench needs the TPU free.
set -eo pipefail
cd "$(dirname "$0")/.."

log() { echo "[queue $(date +%H:%M:%S)] $*"; }

# 1. LLFF/NDC reference-faithful recovery arm (noise 0.02, pin, ref budget)
log "llff_ref_r3 start"
timeout 7800 python train.py --yaml=configs/bat_synthetic_llff_ref.yaml \
  --name=llff_ref_r3 > /tmp/q_llff_ref_r3.log 2>&1
log "llff_ref_r3 done rc=$?"

# 2. 20k regression bisect: current-code baseline (app_k=64)
timeout 4200 python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
  --tpu.app_k_auto! --name=convergence_20k_r3_appk64 > /tmp/q_20k_appk64.log 2>&1
log "20k appk64 done rc=$?"

# 3. 20k regression bisect: app_k disabled (dense appearance)
timeout 5400 python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
  --tpu.app_k! --name=convergence_20k_r3_appknone > /tmp/q_20k_appknone.log 2>&1
log "20k appknone done rc=$?"

# 4. LLFF/NDC stability arm (reference-exact: NO injected noise)
timeout 7800 python train.py --yaml=configs/bat_synthetic_llff_ref.yaml \
  --camera.noise=0.0 --name=llff_ref_r3_nonoise > /tmp/q_llff_nonoise.log 2>&1
log "llff nonoise done rc=$?"

# 5. 20k regression bisect: app_k=128
timeout 4800 python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
  --tpu.app_k=128 --tpu.app_k_auto! --name=convergence_20k_r3_appk128 > /tmp/q_20k_appk128.log 2>&1
log "20k appk128 done rc=$?"

# 6. app_k auto-raise demo (VERDICT #6): base cap 64 with the clip-rate
# probe allowed to raise it at alpha-mask updates
timeout 4800 python train.py --yaml=configs/bat_synthetic_convergence_20k.yaml \
  --name=convergence_20k_r3_appkauto > /tmp/q_20k_appkauto.log 2>&1
log "20k appkauto done rc=$?"

log "queue complete"
