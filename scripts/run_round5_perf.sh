#!/bin/bash
# Round-5 perf measurement window (chip must be free; run between science
# arms).  Sequential with 45 s claim-release gaps; each step logs to /tmp.
set -u
REPO=/root/repo
cd "$REPO"
export JTF_COMPILE_CACHE=$REPO/.jax_cache

log() { echo "[perf5 $(date +%H:%M:%S)] $*" | tee -a /tmp/perf_r5.log; }

log "1/3 tile_scatter decomposition"
timeout 1500 python -u scripts/tile_scatter_bench.py > /tmp/p5_tile.log 2>&1
log "tile_scatter rc=$?"
sleep 45

log "2/3 full bench (new 400^3 shapes, incremental persistence)"
timeout 2400 python -u bench.py > /tmp/p5_bench.json 2> /tmp/p5_bench.log
log "bench rc=$?"
sleep 45

log "3/3 compact phase profile at 400^3"
timeout 1500 python -u scripts/phase_profile.py compact res=400 \
  > /tmp/p5_profile.log 2>&1
log "profile rc=$?"
log "window complete"
