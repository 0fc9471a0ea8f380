#!/usr/bin/env bash
# Round-robin videos across N workers as background jobs (parity:
# scripts/backrun_active_learning.sh, which assigned one video per GPU via
# CUDA_VISIBLE_DEVICES).  On a TPU pod, point each worker at its own slice
# (TPU_VISIBLE_DEVICES / per-host invocation); on one chip this provides the
# same queueing behavior with NUM_WORKERS=1.
set -eu
CFG=${CFG:-configs/posetrack21/al_simple_posetrack.yaml}
UNC=${UNC:-THC+WPU}
REP=${REP:-None}
FILTER=${FILTER:-Coreset}
MEMO=${MEMO:-test}
VIDEO_LIST=${VIDEO_LIST:-configs/posetrack21/val_video_list.txt}
NUM_WORKERS=${NUM_WORKERS:-1}

i=0
while read -r VIDEO_ID; do
  [ -z "$VIDEO_ID" ] && continue
  (
    python -m vatl4pose_tpu.cli.run_active_learning \
      --cfg "$CFG" --uncertainty "$UNC" --representativeness "$REP" \
      --filter "$FILTER" --video_id "$VIDEO_ID" --seedfix --memo "$MEMO"
  ) &
  i=$((i + 1))
  if [ $((i % NUM_WORKERS)) -eq 0 ]; then wait; fi
done < "$VIDEO_LIST"
wait
