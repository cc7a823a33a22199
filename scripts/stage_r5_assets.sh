#!/bin/bash
# Copy the round-5 campaign's committed evidence out of the gitignored
# runs/ tree into docs/assets/r5/ (the pattern docs/assets/r4 established).
set -uo pipefail
cd /root/repo
OUT=docs/assets/r5
mkdir -p $OUT

# Campaign A (64px past the PL boundary) ---------------------------------
cp runs/campaign_r5/train64.log            $OUT/camp_r5_train.log 2>/dev/null || true
cp runs/results/camp_r5/metrics.csv        $OUT/camp_r5_metrics.csv 2>/dev/null || true
cp runs/results/camp_r5/fid_scores.txt     $OUT/camp_r5_fid_scores.txt 2>/dev/null || true
# PL-boundary evidence: the last pre-5000 and the post-5000 status lines
grep "PL:" runs/campaign_r5/train64.log 2>/dev/null | tail -40 > $OUT/camp_r5_pl_tail.log || true
# newest eval grid
ls runs/results/camp_r5/*-ema.* runs/results/camp_r5/*.png 2>/dev/null | tail -1 | xargs -I{} cp {} $OUT/ 2>/dev/null || true

# the 250-image AttFind records (cold/warm f32 + bf16) --------------------
for tag in cold warm bf16; do
  cp runs/campaign_r5/attfind250_$tag.log  $OUT/attfind250_$tag.log 2>/dev/null || true
done
cp runs/attfind_r5/timing.json             $OUT/attfind250_timing.json 2>/dev/null || true
cp runs/attfind_r5_bf16/timing.json        $OUT/attfind250_bf16_timing.json 2>/dev/null || true
cp runs/attfind_r5/top_styles.json         $OUT/attfind250_top_styles.json 2>/dev/null || true
for f in runs/attfind_r5/style_*.png; do [ -f "$f" ] && cp "$f" $OUT/; done 2>/dev/null || true
python - <<'EOF' 2>/dev/null || true
import h5py, json
with h5py.File("runs/attfind_r5/style_change_records.hdf5") as f:
    stats = {k: [list(map(int, f[k].shape)), str(f[k].dtype)] for k in f}
open("docs/assets/r5/attfind250_hdf5_stats.json", "w").write(json.dumps(stats, indent=1))
EOF

# Campaign B (256px NEW arch end-to-end) ----------------------------------
cp runs/campaign_r5/train256.log           $OUT/camp_r5_256_train.log 2>/dev/null || true
cp runs/results/camp_r5_256/metrics.csv    $OUT/camp_r5_256_metrics.csv 2>/dev/null || true
cp runs/results/camp_r5_256/fid_scores.txt $OUT/camp_r5_256_fid_scores.txt 2>/dev/null || true
cp runs/campaign_r5/attfind256.log         $OUT/attfind256.log 2>/dev/null || true
cp runs/attfind_r5_256/timing.json         $OUT/attfind256_timing.json 2>/dev/null || true
cp runs/attfind_r5_256/top_styles.json     $OUT/attfind256_top_styles.json 2>/dev/null || true
for f in runs/attfind_r5_256/style_*.png; do [ -f "$f" ] && cp "$f" $OUT/; done 2>/dev/null || true
cp runs/campaign_r5/counterfactual256.log  $OUT/counterfactual256.log 2>/dev/null || true
cp runs/attfind_r5_256/fid_results.csv     $OUT/attfind256_fid_results.csv 2>/dev/null || true
cp runs/campaign_r5/replay256.log          $OUT/replay256.log 2>/dev/null || true
ls runs/results/camp_r5_256/*.png 2>/dev/null | tail -1 | xargs -I{} cp {} $OUT/ 2>/dev/null || true
cp runs/replay_r5_256/top_styles.json      $OUT/replay256_top_styles.json 2>/dev/null || true

ls -la $OUT
