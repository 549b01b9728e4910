#!/bin/bash
# Round-5 serialized TPU job queue (single chip — jobs must not overlap).
# Each job writes its own doc under docs/; this script only sequences them
# and keeps a heartbeat log. Safe to re-run: geometry_sweep --resume
# continues interrupted training, and finished jobs are skipped via
# sentinel files under $Q.
set -u
cd /root/repo
Q=/tmp/r5_queue
mkdir -p $Q
log() { echo "[$(date +%H:%M:%S)] $*" >> $Q/queue.log; }

run_job() {
    local name=$1; shift
    if [ -f $Q/$name.done ]; then log "$name: already done, skip"; return 0; fi
    log "$name: START: $*"
    "$@" >> $Q/$name.log 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then touch $Q/$name.done; log "$name: DONE"; else log "$name: FAILED rc=$rc"; fi
    return $rc
}

# Job A — VERDICT #1 tail: all six families under the regenerated
# Fibonacci-sphere cameras, res 384 x 2000 epochs, calibrated recipe.
run_job geomA python tools/geometry_sweep.py --workdir /tmp/exps_geom_r5 \
    --geometries cuboid bipyramid slab grid tetra stacked \
    --nepoch 2000 --views 24 --res 384 \
    --merge-eps 0.02 --merge-before-vote --junction-coords vote_mean \
    --vote-ratio 0.2 --check-view-ratio 0.1 --resume \
    --out docs/geometry_sweep_r5_allfam.md \
 || run_job geomA_retry python tools/geometry_sweep.py --workdir /tmp/exps_geom_r5 \
    --geometries cuboid bipyramid slab grid tetra stacked \
    --nepoch 2000 --views 24 --res 384 \
    --merge-eps 0.02 --merge-before-vote --junction-coords vote_mean \
    --vote-ratio 0.2 --check-view-ratio 0.1 --resume \
    --out docs/geometry_sweep_r5_allfam.md

# Job C — VERDICT #4: auction-vs-Hungarian training A/B at DTU shapes.
run_job auctionC python tools/auction_ab_dtu.py --workdir /tmp/dtu_ab \
    --out docs/auction_ab_dtu_r5.md

# Job D — VERDICT #5: throughput-vs-batch curve + quality-matched A/B.
run_job frontierD python tools/batch_frontier.py \
    --out docs/batch_frontier_r5.md
run_job lbabD python tools/large_batch_ab.py --workdir /tmp/lb_ab \
    --batch 4096 --out docs/large_batch_ab_r5.md

# Job B — VERDICT #7: seed robustness of the calibrated recipe
# (seeds 1 and 7 on the two stress families; seed 42 is Job A).
for SEED in 1 7; do
  run_job seedB_$SEED python tools/geometry_sweep.py --workdir /tmp/exps_geom_r5 \
      --geometries cuboid bipyramid \
      --nepoch 2000 --views 24 --res 384 \
      --merge-eps 0.02 --merge-before-vote --junction-coords vote_mean \
      --vote-ratio 0.2 --check-view-ratio 0.1 --seed $SEED --resume \
      --out docs/seed_sweep_r5_s$SEED.md
done

log "QUEUE COMPLETE"
