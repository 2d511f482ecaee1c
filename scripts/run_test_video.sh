#!/bin/sh
# Eval harness — the role of runtestvid.sh: seeded tiled whole-frame eval
# sweeps (runtestvid.sh:20-122 runs the same eval over seeds
# 24751 5079 7814 37062 4791; README.md:42 uses manualSeed=222).
set -e
: "${DATA_ROOT:?set DATA_ROOT to the video corpus root}"
: "${NET:?set NET to a generator checkpoint .npz}"
MASK="${MASK:-assets/masks/maskppp.png}"
SEEDS="${SEEDS:-24751 5079 7814 37062 4791}"

for seed in $SEEDS; do
  python -m video_filler_tpu.eval.wholeim DATA_ROOT="$DATA_ROOT" \
    maskName="$MASK" net="$NET" loadSize="${loadSize:-240}" \
    predLen="${predLen:-4}" nBottleneck="${nBottleneck:-5000}" \
    manualSeed="$seed" name="eval_s$seed"
done
