#!/usr/bin/env bash
# Production-scale synthetic experiment (the exp/AL_fullscale_* artifacts).
#
# 1. Pre-train SimplePose-R50 @256x192 on 10 mixed-resolution synthetic
#    videos through the streaming data path until it solves them
#    (validate AP ~= 1.0)  -> exp/pretrain_multi/model_best.pkl
# 2. Run the DUW strategy (THC+WPU + Influence + Coreset, continual) on a
#    domain-shifted unseen 240-sample video from that checkpoint, once in
#    f32 parity mode and once with --speedup (bf16 forward + bf16
#    mixed-precision retrain), recording per-phase cycle times.
# 3. Same for the JRDB family: FastPose-SE-R50+DUC pre-trained on a
#    10-video synthetic JRDB fixture (JRDB2022 dataset path, 3-digit track
#    ids), then DUW on a shifted unseen JRDB-style video.
#
# Every run is a plain CLI invocation — no hidden drivers.
set -euo pipefail
cd "$(dirname "$0")/.."

# domain gap vs the pre-training fixture (sigma 3.0, amp 140, bg 40,
# shift 0): blobs move to the next RGB channel, get narrower and dimmer,
# background gets brighter
SHIFT="1 2.5 120 60"      # channel_shift blob_sigma blob_amp bg_level
SEED=777                  # video seed != pretraining seeds => unseen video

python -m vatl4pose_tpu.cli.posetrack_train \
  --cfg exp/pretrain_multi.yaml --synthetic --synth_videos 10 \
  --exp-id pretrain_multi --work_dir exp/pretrain_multi

for MODE in "" "--speedup"; do
  MEMO=fullscale_r2$(if [ -n "$MODE" ]; then echo _bf16; fi)
  python -m vatl4pose_tpu.cli.run_active_learning \
    --cfg exp/al_learn_synth3.yaml \
    --uncertainty THC+WPU --representativeness Influence --filter Coreset \
    --video_id 000100 --memo "$MEMO" --seedfix --continual $MODE \
    --synthetic --synth_frames 80 --synth_persons 3 \
    --synth_seed $SEED --synth_shift $SHIFT
done

# JRDB family (FastPose + JRDB2022 dataset path)
python -m vatl4pose_tpu.cli.jrdbpose_train \
  --cfg exp/pretrain_jrdb.yaml --synthetic --synth_videos 10 \
  --exp-id pretrain_jrdb --work_dir exp/pretrain_jrdb

python -m vatl4pose_tpu.cli.run_active_learning \
  --cfg exp/al_jrdb_synth.yaml \
  --uncertainty THC+WPU --representativeness Influence --filter Coreset \
  --video_id 000200 --memo fullscale_jrdb --seedfix --continual \
  --synthetic --synth_frames 80 --synth_persons 3 \
  --synth_seed 888 --synth_shift $SHIFT

# HRNet-W32 on the JRDB family (BASELINE config #5: "HRNet on JRDB-Pose
# full ATL") — pretrain to AP~1.0 on the 10-video fixture, then DUW on a
# shifted unseen video -> exp/AL_fullscale_hrnet_jrdb
python -m vatl4pose_tpu.cli.jrdbpose_train \
  --cfg exp/pretrain_hrnet_jrdb.yaml --synthetic --synth_videos 10 \
  --exp-id pretrain_hrnet_jrdb --work_dir exp/pretrain_hrnet_jrdb

python -m vatl4pose_tpu.cli.run_active_learning \
  --cfg exp/al_hrnet_jrdb.yaml \
  --uncertainty THC+WPU --representativeness Influence --filter Coreset \
  --video_id 000300 --memo fullscale_hrnet_jrdb --seedfix --continual \
  --synthetic --synth_frames 80 --synth_persons 3 \
  --synth_seed 999 --synth_shift $SHIFT
