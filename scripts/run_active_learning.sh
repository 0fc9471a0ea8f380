#!/usr/bin/env bash
# Loop Run_active_learning over a video-id list with a fixed strategy
# (parity: scripts/run_active_learning.sh — THC+WPU + Coreset default).
set -eu
CFG=${CFG:-configs/posetrack21/al_simple_posetrack.yaml}
UNC=${UNC:-THC+WPU}
REP=${REP:-None}
FILTER=${FILTER:-Coreset}
MEMO=${MEMO:-test}
VIDEO_LIST=${VIDEO_LIST:-configs/posetrack21/val_video_list.txt}

while read -r VIDEO_ID; do
  [ -z "$VIDEO_ID" ] && continue
  echo "=== video ${VIDEO_ID} ==="
  python -m vatl4pose_tpu.cli.run_active_learning \
    --cfg "$CFG" --uncertainty "$UNC" --representativeness "$REP" \
    --filter "$FILTER" --video_id "$VIDEO_ID" --seedfix --memo "$MEMO" "$@"
done < "$VIDEO_LIST"
