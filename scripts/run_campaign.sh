#!/bin/bash
# End-to-end training campaign on the real TPU chip:
#   synthetic data -> classifier pretrain -> StylEx OLD (with a resume) ->
#   StylEx NEW -> NaN-recovery demo -> loss-curve plots.
# Mirrors the reference's full workflow (classifier_training.ipynb ->
# stylex_train CLI) end to end. Logs under runs/campaign/.
set -uo pipefail
cd /root/repo
mkdir -p runs/campaign
LOG=runs/campaign
DATA=runs/data/synth64

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "1/6 synthetic dataset"
python scripts/make_synthetic_dataset.py --out $DATA --per-class 2048 --seed 42 \
  > $LOG/data.log 2>&1 || { echo DATA_FAILED; exit 1; }

step "2/6 classifier pretraining (mobilenet, 64px)"
# --amount-frozen-layers 0: the reference freezes most of an ImageNet-
# pretrained trunk; offline we init randomly, so a frozen trunk would be
# random features — train it all
python -m stylex_tpu.train_classifier --dataset PlantVillage --data-root $DATA \
  --model mobilenet --image-size 64 --epochs 5 --batch-size 64 --lr 1e-3 \
  --amount-frozen-layers 0 \
  --checkpoint-name synth64_mobilenet.msgpack --saved-models-dir runs/models \
  --results-dir $LOG/classifier --tensorboard-dir $LOG/tb_clf \
  > $LOG/classifier.log 2>&1 || { echo CLASSIFIER_FAILED; exit 1; }
tail -2 $LOG/classifier.log

COMMON="--data $DATA --results-dir runs/results --models-dir runs/models \
  --image-size 64 --batch-size 4 --gradient-accumulate-every 8 \
  --classifier-name mobilenet --classifier-path runs/models/synth64_mobilenet.msgpack \
  --num-classes 2 --save-every 250 --evaluate-every 250 --num-image-tiles 4 \
  --tensorboard-dir none --seed 42"

step "3/6 StylEx OLD arch: steps 0-1000"
python -m stylex_tpu.cli $COMMON --name camp_old --new --num-train-steps 1000 \
  > $LOG/old_part1.log 2>&1 || { echo OLD1_FAILED; tail -30 $LOG/old_part1.log; exit 1; }

step "4/6 StylEx OLD arch: resume 1000-2000"
python -m stylex_tpu.cli $COMMON --name camp_old --num-train-steps 2000 \
  > $LOG/old_part2.log 2>&1 || { echo OLD2_FAILED; tail -30 $LOG/old_part2.log; exit 1; }

step "5/6 StylEx NEW arch: steps 0-2000"
python -m stylex_tpu.cli $COMMON --name camp_new --new --use-old-architecture false \
  --num-train-steps 2000 \
  > $LOG/new.log 2>&1 || { echo NEW_FAILED; tail -30 $LOG/new.log; exit 1; }

step "6/6 NaN-recovery demo (CPU) + plots"
python scripts/nan_recovery_demo.py $DATA > $LOG/nan_demo.log 2>&1 \
  || { echo NAN_DEMO_FAILED; tail -30 $LOG/nan_demo.log; exit 1; }
tail -3 $LOG/nan_demo.log
python scripts/plot_campaign.py --results-dir runs/results --names camp_old camp_new \
  > $LOG/plot.log 2>&1 || echo PLOT_FAILED

echo CAMPAIGN_DONE
