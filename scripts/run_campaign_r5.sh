#!/bin/bash
# Round-5 campaigns (VERDICT r4 Next #1/#3/#4):
#
# Campaign A (64px, OLD arch — the camp_r4 family continued):
#   train PAST the 5,000-step path-length boundary (5,600 steps, so the
#   every-32 PL penalty of `stylex_train.py:1273,1422-1429` actually fires
#   on chip and the log shows finite PL values), then the 250-image AttFind
#   record with the r5 overhead kills (phase-1 state capture, host-side
#   checkpoint casts) — cold + warm f32 runs and a bf16 run, each with the
#   per-stage wall breakdown (timing.json).
#
# Campaign B (256px, NEW arch — the reference's headline configuration,
#   `stylex_train_new.py:1013-1871` + `cli.py:93`): train 3,000 steps in
#   bf16 with generator remat, then the FULL AttFind-256 250-image sweep ->
#   style_change_records.hdf5 -> top-k -> counterfactual fid_topk CSV
#   (`FID_TensorFlow.ipynb` cells 20-28) -> replay + panels.
#
# Logs under runs/campaign_r5/. Stages skip when their artifact exists, so
# the script is resumable.
set -uo pipefail
cd /root/repo
mkdir -p runs/campaign_r5
LOG=runs/campaign_r5
DATA64=runs/data/synth64
DATA256=runs/data/synth256

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# ---------------- Campaign A: 64px past the PL boundary ----------------
if [ -z "${SKIP_A:-}" ]; then

if [ ! -d "$DATA64/healthy" ]; then
  step "A1 synthetic dataset (64px)"
  python scripts/make_synthetic_dataset.py --out $DATA64 --per-class 2048 --seed 42 \
    > $LOG/data64.log 2>&1 || { echo DATA64_FAILED; exit 1; }
else
  step "A1 synthetic dataset (cached)"
fi

if [ ! -f runs/models/synth64_mobilenet.msgpack ]; then
  step "A2 classifier pretraining (mobilenet, 64px)"
  python -m stylex_tpu.train_classifier --dataset PlantVillage --data-root $DATA64 \
    --model mobilenet --image-size 64 --epochs 5 --batch-size 64 --lr 1e-3 \
    --amount-frozen-layers 0 \
    --checkpoint-name synth64_mobilenet.msgpack --saved-models-dir runs/models \
    --results-dir $LOG/classifier64 --tensorboard-dir $LOG/tb_clf64 \
    > $LOG/classifier64.log 2>&1 || { echo CLASSIFIER64_FAILED; tail -20 $LOG/classifier64.log; exit 1; }
  tail -2 $LOG/classifier64.log
else
  step "A2 classifier (cached)"
fi

step "A3 StylEx OLD arch 64px: 5,600 steps (PL fires after 5,000)"
python -m stylex_tpu.cli --data $DATA64 --results-dir runs/results \
  --models-dir runs/models --name camp_r5 \
  --image-size 64 --batch-size 4 --gradient-accumulate-every 8 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-classes 2 --save-every 500 --evaluate-every 500 --num-image-tiles 4 \
  --calculate-fid-every 2000 --calculate-fid-num-images 2048 \
  --steps-per-dispatch 10 --tensorboard-dir none --seed 42 \
  --num-train-steps 5600 \
  >> $LOG/train64.log 2>&1 || { echo TRAIN64_FAILED; tail -30 $LOG/train64.log; exit 1; }
# the PL boundary evidence: finite PL after step 5,000
grep "PL:" $LOG/train64.log | tail -3

if [ -n "${RUN_A4:-}" ]; then
step "A4 AttFind 250 images, f32 (cold caches)"
time python -m stylex_tpu.run_attfind --name camp_r5 \
  --models-dir runs/models --data $DATA64 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-images 250 --num-indices 5 --shift-size 1 \
  --results-folder runs/attfind_r5_cold --visualize-top 0 \
  > $LOG/attfind250_cold.log 2>&1 || { echo ATTFIND_COLD_FAILED; tail -30 $LOG/attfind250_cold.log; exit 1; }
tail -4 $LOG/attfind250_cold.log
fi

step "A5 AttFind 250 images, f32 (warm caches) — the committed record"
time python -m stylex_tpu.run_attfind --name camp_r5 \
  --models-dir runs/models --data $DATA64 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-images 250 --num-indices 5 --shift-size 1 \
  --results-folder runs/attfind_r5 --visualize-top 5 \
  > $LOG/attfind250_warm.log 2>&1 || { echo ATTFIND_WARM_FAILED; tail -30 $LOG/attfind250_warm.log; exit 1; }
tail -6 $LOG/attfind250_warm.log

if [ -n "${RUN_A6:-}" ]; then
step "A6 AttFind 250 images, bf16 (TPU-native fast path)"
time python -m stylex_tpu.run_attfind --name camp_r5 \
  --models-dir runs/models --data $DATA64 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-images 250 --num-indices 5 --shift-size 1 --dtype bfloat16 \
  --results-folder runs/attfind_r5_bf16 --visualize-top 0 \
  > $LOG/attfind250_bf16.log 2>&1 || { echo ATTFIND_BF16_FAILED; tail -30 $LOG/attfind250_bf16.log; exit 1; }
tail -4 $LOG/attfind250_bf16.log
fi

fi  # SKIP_A

# ---------------- Campaign B: 256px NEW arch, end to end ----------------
if [ -z "${SKIP_B:-}" ]; then

if [ ! -d "$DATA256/healthy" ]; then
  step "B1 synthetic dataset (256px)"
  python scripts/make_synthetic_dataset.py --out $DATA256 --size 256 --per-class 1024 \
    --seed 7 > $LOG/data256.log 2>&1 || { echo DATA256_FAILED; exit 1; }
else
  step "B1 synthetic dataset (cached)"
fi

if [ ! -f runs/models/synth256_mobilenet.msgpack ]; then
  step "B2 classifier pretraining (mobilenet, 256px)"
  python -m stylex_tpu.train_classifier --dataset PlantVillage --data-root $DATA256 \
    --model mobilenet --image-size 256 --epochs 3 --batch-size 32 --lr 1e-3 \
    --amount-frozen-layers 0 \
    --checkpoint-name synth256_mobilenet.msgpack --saved-models-dir runs/models \
    --results-dir $LOG/classifier256 --tensorboard-dir $LOG/tb_clf256 \
    > $LOG/classifier256.log 2>&1 || { echo CLASSIFIER256_FAILED; tail -20 $LOG/classifier256.log; exit 1; }
  tail -2 $LOG/classifier256.log
else
  step "B2 classifier (cached)"
fi

STEPS256=${STEPS256:-3000}
step "B3 StylEx NEW arch @256px, bf16 + remat, $STEPS256 steps"
python -m stylex_tpu.cli --data $DATA256 --results-dir runs/results \
  --models-dir runs/models --name camp_r5_256 \
  --image-size 256 --batch-size 4 --gradient-accumulate-every 2 \
  --bf16 --remat --use-old-architecture false \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth256_mobilenet.msgpack \
  --num-classes 2 --num-train-steps $STEPS256 --save-every 500 \
  --evaluate-every 500 --num-image-tiles 4 \
  --calculate-fid-every 1500 --calculate-fid-num-images 1024 \
  --steps-per-dispatch 10 --tensorboard-dir none --seed 7 \
  >> $LOG/train256.log 2>&1 || { echo TRAIN256_FAILED; tail -30 $LOG/train256.log; exit 1; }
grep "PL:\|step " $LOG/train256.log | tail -3

step "B4 AttFind-256: 250 images end-to-end"
time python -m stylex_tpu.run_attfind --name camp_r5_256 \
  --models-dir runs/models --data $DATA256 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth256_mobilenet.msgpack \
  --num-images 250 --num-indices 5 --shift-size 1 \
  --results-folder runs/attfind_r5_256 --visualize-top 5 \
  > $LOG/attfind256.log 2>&1 || { echo ATTFIND256_FAILED; tail -30 $LOG/attfind256.log; exit 1; }
tail -6 $LOG/attfind256.log

step "B5 counterfactual FID top-5 @256 (FID_TensorFlow.ipynb cells 20-28)"
python scripts/run_counterfactual.py --name camp_r5_256 \
  --models-dir runs/models \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth256_mobilenet.msgpack \
  --attfind-dir runs/attfind_r5_256 --k 5 --batch-size 16 \
  > $LOG/counterfactual256.log 2>&1 || { echo CF256_FAILED; tail -30 $LOG/counterfactual256.log; exit 1; }
tail -8 $LOG/counterfactual256.log

step "B6 replay from precomputed records (all_results_notebook equivalent)"
python -m stylex_tpu.replay_results --records runs/attfind_r5_256/style_change_records.hdf5 \
  --name camp_r5_256 --models-dir runs/models \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth256_mobilenet.msgpack \
  --num-indices 5 --visualize-top 3 --out runs/replay_r5_256 \
  > $LOG/replay256.log 2>&1 || { echo REPLAY256_FAILED; tail -30 $LOG/replay256.log; exit 1; }
tail -4 $LOG/replay256.log

python scripts/plot_campaign.py --results-dir runs/results --names camp_r5_256 \
  > $LOG/plot.log 2>&1 || echo PLOT_FAILED

fi  # SKIP_B

echo CAMPAIGN_R5_DONE
