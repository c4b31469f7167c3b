#!/bin/bash
# NDC pose-drift mitigation probes (round-2 continuation).  Round-2's
# E1-E4 diagnosis (docs/CONVERGENCE.md) localized the forward-facing
# drift to gauge flatness + metric conditioning, not an NDC code defect.
# These probes test the two cheapest mitigations on the E1 protocol
# (noise=0, poses learnable, NDC):
#   E5 = E1 + pin_first_pose (gauge anchor: view-0 se3 refinement frozen,
#        the 3D analogue of the planar warp_param[0]=0 pin)
#   E6 = E5 + sustained 4096-ray batches (no drop to 2048 at it 400):
#        2x lower pose-gradient noise -> slower random walk along the
#        residual (non-SE3) flat directions
set -xeo pipefail
cd "$(dirname "$0")/.."
COMMON="--yaml=configs/bat_synthetic_llff.yaml --max_iter=1500 \
  --train_schedule.upsample_iters=[400,700] \
  --train_schedule.update_alphamask_iters=[] \
  --train_schedule.reset_pose_on_iter=100000 \
  --freq.scalar=100 --camera.noise= \
  --train_schedule.pin_first_pose=true"
timeout 2000 python train.py $COMMON \
  --train_schedule.change_n_rays_after_n_iters=400 \
  --name=ndc_e5_pin 2>&1 | tail -4
timeout 2000 python train.py $COMMON \
  --train_schedule.change_n_rays_after_n_iters=100000 \
  --name=ndc_e6_pin_bigbatch 2>&1 | tail -4
echo GAUGE PROBES DONE
