#!/bin/bash
# Round-5 restart queue (session reset wiped save_dir): PPN lmd_coor=20
# attack, time-boxed to 12k steps with a compressed decay schedule
# (x0.33 every 4.5k ~ the 20k recipe's two decays), then auto
# tune->eval. Segments + timeout per the tunnel-wedge mitigation.
set -u
cd /root/repo
mkdir -p logs

for N in 2500 5000 7500 10000 12000; do
  timeout 2400 python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type PoseProposal \
    --model_backbone Resnet18 --model_name synth_ppn_r5coor \
    --batch_size 16 --lr_init 5e-4 --lr_decay_every_step 4500 \
    --lr_decay_factor 0.33 --ppn_lambda lmd_coor=20 --save_interval 2000 \
    --n_step $N --log_interval 100 >> logs/ppn_r5coor_train.log 2>&1
  if grep -q "total_loss=nan" logs/ppn_r5coor_train.log; then
    echo "NAN DETECTED, aborting" >> logs/ppn_r5coor_train.log
    exit 1
  fi
done
echo "PPN R5COOR TRAINED" >> logs/ppn_r5coor_train.log

timeout 1800 python scripts/tune_ppn_decode.py --dataset_path ./data_synth_1600 \
  --weights save_dir/synth_ppn_r5coor/model_dir/newest_model.npz --final_val \
  > logs/ppn_r5coor_tune.log 2>&1
echo "QUEUE5 DONE rc=$?" >> logs/ppn_r5coor_tune.log
