#!/bin/bash
# High-resolution (256px) training demo on the real TPU chip:
# synthetic data -> classifier pretrain -> StylEx NEW arch at 256px in
# bf16 with generator-block rematerialisation (the shipping high-res
# recipe). Complements run_campaign.sh's 64px OLD/NEW campaigns.
# Logs under runs/campaign256/.
set -uo pipefail
cd /root/repo
mkdir -p runs/campaign256
LOG=runs/campaign256
DATA=runs/data/synth256
STEPS=${STEPS:-400}

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "1/3 synthetic dataset (256px)"
python scripts/make_synthetic_dataset.py --out $DATA --size 256 --per-class 512 \
  --seed 7 > $LOG/data.log 2>&1 || { echo DATA_FAILED; exit 1; }

step "2/3 classifier pretraining (mobilenet, 256px)"
# frozen-random-trunk hazard: see run_campaign.sh — train all layers
python -m stylex_tpu.train_classifier --dataset PlantVillage --data-root $DATA \
  --model mobilenet --image-size 256 --epochs 3 --batch-size 32 --lr 1e-3 \
  --amount-frozen-layers 0 \
  --checkpoint-name synth256_mobilenet.msgpack --saved-models-dir runs/models \
  --results-dir $LOG/classifier --tensorboard-dir $LOG/tb_clf \
  > $LOG/classifier.log 2>&1 || { echo CLASSIFIER_FAILED; tail -20 $LOG/classifier.log; exit 1; }
tail -2 $LOG/classifier.log

step "3/3 StylEx NEW arch @256px, bf16 + remat, $STEPS steps"
python -m stylex_tpu.cli --data $DATA --results-dir runs/results \
  --models-dir runs/models --name camp256_new --new \
  --image-size 256 --batch-size 4 --gradient-accumulate-every 2 \
  --bf16 --remat --use-old-architecture false \
  --classifier-name mobilenet \
  --classifier-path runs/models/synth256_mobilenet.msgpack \
  --num-classes 2 --num-train-steps $STEPS --save-every 200 \
  --evaluate-every 200 --num-image-tiles 4 --tensorboard-dir none --seed 7 \
  > $LOG/train256.log 2>&1 || { echo TRAIN256_FAILED; tail -30 $LOG/train256.log; exit 1; }
tail -5 $LOG/train256.log

python scripts/plot_campaign.py --results-dir runs/results --names camp256_new \
  > $LOG/plot.log 2>&1 || echo PLOT_FAILED
echo CAMPAIGN256_DONE
