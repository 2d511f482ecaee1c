#!/bin/sh
# Experiment harness for the video regime — the role of runtrainvid.sh:
# canonical hyperparameter sets from the reference's experiment ledger
# (runtrainvid.sh:31-61), translated to this framework's CLI.  Pass an
# experiment name as $1; DATA_ROOT must point at the frame corpus
# (gt/ + gt1/ numbered frames).
set -e
: "${DATA_ROOT:?set DATA_ROOT to the video corpus root}"
MASK="${MASK:-assets/masks/maskppp.png}"
EXP="${1:-canonical}"

case "$EXP" in
  canonical)    # runtrainvid.sh:61 (0912): weight_nomask=0.5
    python -m video_filler_tpu.train regime=video DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" nBottleneck=5000 name=vid_canonical loadSize=240 \
      nThreads=4 predLen=1 batchSize=64 weight_nomask=0.5 wtl2=0.999 ;;
  maskvalue0)   # "changemaskvalue": hole filled with black
    python -m video_filler_tpu.train regime=video DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" nBottleneck=4000 name=vid_maskvalue0 loadSize=360 \
      nThreads=4 predLen=1 batchSize=64 weight_nomask=1 maskValue=0 \
      wtl2=0.999 ;;
  finetune)     # resume semantics (loadName/loadIter)
    python -m video_filler_tpu.train regime=video DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" nBottleneck=4000 name=vid_maskvalue0 loadSize=360 \
      loadName=vid_maskvalue0 loadIter=40 nThreads=4 predLen=1 \
      batchSize=64 weight_nomask=1 wtl2=0.999 ;;
  l2gdl)        # NOTE: flagged "!!Diverges" in the reference ledger
    python -m video_filler_tpu.train regime=video DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" nBottleneck=5000 name=vid_l2gdl loadSize=240 \
      nThreads=4 predLen=1 batchSize=64 weight_nomask=0.05 wtl2=1 \
      wtgdl=0.5 ;;
  init)         # initializer cascade (withInit/initName)
    : "${INIT_NET:?set INIT_NET to a pretrained checkpoint .npz}"
    python -m video_filler_tpu.train regime=video DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" nBottleneck=5000 name=vid_init loadSize=280 \
      nThreads=4 predLen=1 batchSize=64 lr=0.0001 weight_nomask=1 \
      wtl2=0.999 withInit=1 initName="$INIT_NET" ;;
  wholeim)      # train_wholeim_input.lua regime
    python -m video_filler_tpu.train regime=wholeim DATA_ROOT="$DATA_ROOT" \
      maskName="$MASK" name=wholeim loadSize=360 batchSize=32 \
      nBottleneck=6400 nef=192 ngf=192 ndf=128 wtl2=0.999 \
      checkpointEvery=2 ;;
  *) echo "unknown experiment '$EXP'" >&2; exit 2 ;;
esac
