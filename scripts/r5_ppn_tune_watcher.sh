#!/bin/bash
# Waits for the PPN r5coor training marker, tunes decode thresholds on the
# held-out split (CPU), then evals on the val protocol with the best config.
set -u
cd /root/repo
while ! grep -q "PPN R5COOR TRAINED" logs/ppn_r5coor_train.log 2>/dev/null; do
  sleep 60
done
JAX_PLATFORMS=cpu python scripts/tune_ppn_decode.py \
  --dataset_path ./data_synth_1600 \
  --weights save_dir/synth_ppn_r5coor/model_dir/newest_model.npz \
  --out /tmp/ppn_r5coor_best.json > logs/ppn_r5coor_tune.log 2>&1
BEST=$(python - << 'PY'
import json
cfg = json.load(open("/tmp/ppn_r5coor_best.json"))
print(",".join(f"{k}={v}" for k, v in cfg.items()))
PY
)
echo "BEST=$BEST" >> logs/ppn_r5coor_tune.log
python eval.py --synthetic --dataset_path ./data_synth_1600 \
  --synthetic_train_scenes 1600 --model_type PoseProposal \
  --model_backbone Resnet18 --model_name synth_ppn_r5coor --eval_num 100 \
  --ppn_decoder "$BEST" > logs/ppn_r5coor_eval.log 2>&1
echo "PPN R5 EVAL DONE" >> logs/ppn_r5coor_eval.log
