#!/usr/bin/env bash
# DTU pipeline: finalize + wireframe/line/surface evals for one scan
# (the reference code/scripts/eval-neat-dtu-lsr.sh recipe).
#   scripts/eval-neat-dtu.sh <rundir> <data_root> <dtu_eval_dir> <scan>
set -euo pipefail
RUNDIR=${1:?rundir}
DATA_ROOT=${2:?data_root}
DTU_EVAL=${3:?DTU eval dir (ObsMask/ + Points/stl/)}
SCAN=${4:?scan id}

python -m neat_tpu.wireframe.finalize \
    --conf "$RUNDIR/runconf.conf" --checkpoint latest --data_root "$DATA_ROOT" \
    --ckview 5 --ckdist 100

WFC=$(ls -t "$RUNDIR"/wireframes/*-wfi_checked.npz | head -1)
CAMS="$DATA_ROOT/DTU/scan$SCAN/cameras.npz"
echo "== junction ACC/COMP =="
python -m neat_tpu.evaluation.eval_lsr --mode junctions \
    --data "$WFC" --scan "$SCAN" --dataset_dir "$DTU_EVAL" --cameras "$CAMS"
echo "== line ACC/COMP (32-pt resampling) =="
python -m neat_tpu.evaluation.eval_lsr --mode lines \
    --data "$WFC" --scan "$SCAN" --dataset_dir "$DTU_EVAL" --cameras "$CAMS"

echo "== surface ACC/COMP =="
python -m neat_tpu.evaluation.render_eval \
    --conf "$RUNDIR/runconf.conf" --data_root "$DATA_ROOT" --views 0
MESH=$(ls -t "$RUNDIR"/evaluation/surface_*.ply | head -1)
python -m neat_tpu.evaluation.eval_dtu \
    --data "$MESH" --scan "$SCAN" --dataset_dir "$DTU_EVAL"
