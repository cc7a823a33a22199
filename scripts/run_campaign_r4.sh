#!/bin/bash
# Round-4 campaign (VERDICT r3 Next #1/#5): a longer training run with the
# training-time FID cadence live, producing the checkpoint for the full
# 250-image end-to-end AttFind artifact.
#   synthetic data -> classifier pretrain -> StylEx OLD 5000 steps with
#   --calculate-fid-every 1000 (fid_scores.txt, reference
#   `stylex_train.py:1490-1503`) -> 250-image AttFind (reference
#   `run_attfind_combined.ipynb` cell 7, the "~5 hours" workload).
# Logs under runs/campaign_r4/.
set -uo pipefail
cd /root/repo
mkdir -p runs/campaign_r4
LOG=runs/campaign_r4
DATA=runs/data/synth64

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

if [ ! -d "$DATA/healthy" ]; then
  step "1/4 synthetic dataset"
  python scripts/make_synthetic_dataset.py --out $DATA --per-class 2048 --seed 42 \
    > $LOG/data.log 2>&1 || { echo DATA_FAILED; exit 1; }
else
  step "1/4 synthetic dataset (cached)"
fi

if [ ! -f runs/models/synth64_mobilenet.msgpack ]; then
  step "2/4 classifier pretraining (mobilenet, 64px)"
  python -m stylex_tpu.train_classifier --dataset PlantVillage --data-root $DATA \
    --model mobilenet --image-size 64 --epochs 5 --batch-size 64 --lr 1e-3 \
    --amount-frozen-layers 0 \
    --checkpoint-name synth64_mobilenet.msgpack --saved-models-dir runs/models \
    --results-dir $LOG/classifier --tensorboard-dir $LOG/tb_clf \
    > $LOG/classifier.log 2>&1 || { echo CLASSIFIER_FAILED; exit 1; }
  tail -2 $LOG/classifier.log
else
  step "2/4 classifier (cached)"
fi

# 2048 FID images (not the reference's 12800 default) keeps each of the 5
# FID evals inside a few minutes on the 1-core host image pipeline; the
# cadence + fid_scores.txt machinery under test is identical.
step "3/4 StylEx OLD arch: 5000 steps, FID every 1000"
python -m stylex_tpu.cli --data $DATA --results-dir runs/results \
  --models-dir runs/models --name camp_r4 --new \
  --image-size 64 --batch-size 4 --gradient-accumulate-every 8 \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-classes 2 --save-every 500 --evaluate-every 500 --num-image-tiles 4 \
  --calculate-fid-every 1000 --calculate-fid-num-images 2048 \
  --steps-per-dispatch 10 --tensorboard-dir none --seed 42 \
  --num-train-steps 5000 \
  > $LOG/train.log 2>&1 || { echo TRAIN_FAILED; tail -30 $LOG/train.log; exit 1; }
tail -3 runs/results/camp_r4/fid_scores.txt 2>/dev/null || true

step "4/4 AttFind: 250 images end-to-end (the reference's ~5 h workload)"
time python -m stylex_tpu.run_attfind --name camp_r4 \
  --models-dir runs/models --data $DATA \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-images 250 --num-indices 5 --shift-size 1 \
  --results-folder runs/attfind_r4 --visualize-top 5 \
  > $LOG/attfind250.log 2>&1 || { echo ATTFIND_FAILED; tail -30 $LOG/attfind250.log; exit 1; }
tail -8 $LOG/attfind250.log

echo CAMPAIGN_R4_DONE
