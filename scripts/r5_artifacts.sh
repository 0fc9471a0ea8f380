#!/usr/bin/env bash
# Round-5 artifact runs (VERDICT r4 directive #6):
#
#  (a) back-to-back fullscale DUW pair under ONE fresh
#      JAX_COMPILATION_CACHE_DIR, both with --speedup (the bf16 serving +
#      fused_eval path whose round-0 compile bill is the one worth
#      amortizing): run 1 pays every compile, run 2 must show round-0
#      ≈ steady-state cycle times -> exp/AL_pair_r5/*/cycle_times.jsonl
#  (b) a current --optimize run (grid sampler, 6 trials) emitting BOTH
#      optuna_history.png and optuna_slice.png (Run_active_learning.py:205-209)
#
# Prerequisite: the pretrained checkpoint (exp/ outputs are gitignored, so
# a fresh clone has to retrain it first — same command as
# scripts/fullscale_experiment.sh step 1).
set -uo pipefail
cd "$(dirname "$0")/.."

SHIFT="1 2.5 120 60"
SEED=777
STAMP() { date +%H:%M:%S; }

if [ ! -f exp/pretrain_multi/model_best.pkl ]; then
  echo "[$(STAMP)] pretraining SimplePose-R50 on the 10-video fixture..."
  # 60 epochs: validate AP saturates (>=0.999) by epoch ~51 on this fixture
  # (exp/pretrain_multi.log) — the full 120 doubles the wall for nothing
  python -m vatl4pose_tpu.cli.posetrack_train \
    --cfg exp/pretrain_multi.yaml --synthetic --synth_videos 10 \
    --exp-id pretrain_multi --work_dir exp/pretrain_multi \
    --epochs_override 60
fi

PAIRCACHE=$(mktemp -d /tmp/paircache.XXXX)
echo "[$(STAMP)] pair cache dir: $PAIRCACHE (fresh => run 1 is fully cold)"
for RUN in pair1 pair2; do
  echo "[$(STAMP)] fullscale --speedup run: $RUN"
  JAX_COMPILATION_CACHE_DIR="$PAIRCACHE" \
  python -m vatl4pose_tpu.cli.run_active_learning \
    --cfg exp/al_learn_synth3.yaml \
    --uncertainty THC+WPU --representativeness Influence --filter Coreset \
    --video_id 000100 --memo "pair_r5_$RUN" --seedfix --continual --speedup \
    --synthetic --synth_frames 80 --synth_persons 3 \
    --synth_seed $SEED --synth_shift $SHIFT
done
echo "[$(STAMP)] pair done"

echo "[$(STAMP)] --optimize grid run (6 trials)"
python -m vatl4pose_tpu.cli.run_active_learning \
  --cfg exp/al_learn_synth3.yaml \
  --uncertainty THC+WPU --representativeness Influence --filter Coreset \
  --video_id 000100 --memo optimize_r5 --seedfix --continual --speedup \
  --optimize --search grid \
  --synthetic --synth_frames 80 --synth_persons 3 \
  --synth_seed $SEED --synth_shift $SHIFT
echo "[$(STAMP)] all artifacts done"
