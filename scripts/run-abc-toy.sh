#!/usr/bin/env bash
# End-to-end ABC toy workflow (the reference README's toy recipe):
# train -> finalize -> evaluate. The view-ratio vote gate reproduces the
# exact-wireframe result (P = R = 1.000, RESULTS.md). Usage:
#   scripts/run-abc-toy.sh <data_root> [nepochs] [exps_folder]
set -euo pipefail
DATA_ROOT=${1:?usage: run-abc-toy.sh <data_root> [nepochs] [exps_folder]}
NEPOCH=${2:-2000}
EXPS=${3:-./exps}

python -m neat_tpu.train.runner \
    --conf confs/abc-neat-a.conf \
    --data_root "$DATA_ROOT" --exps_folder "$EXPS" --nepoch "$NEPOCH"

RUNDIR=$(ls -dt "$EXPS"/abc_000075213_neat_a/*/ | head -1)
python -m neat_tpu.wireframe.finalize \
    --conf "$RUNDIR/runconf.conf" --checkpoint latest --data_root "$DATA_ROOT" \
    --vote-ratio 0.2

PKL=$(ls -t "$RUNDIR"/wireframes/*-neat.pkl | head -1)
python -m neat_tpu.evaluation.eval_abc \
    --data "$PKL" --scan "$DATA_ROOT/abc/00075213"
