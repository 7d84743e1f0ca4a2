#!/bin/bash
# Round-5 TPU queue 3d: PPN attack in 2.5k-step segments (tunnel wedges
# observed twice mid-run; orbax resume every 2k caps the loss), then
# PifPaf full-res.
set -u
cd /root/repo

for N in 5000 7500 10000 12500 15000 17500 20000; do
  timeout 2400 python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type PoseProposal \
    --model_backbone Resnet18 --model_name synth_ppn_r5coor \
    --batch_size 16 --lr_init 5e-4 --lr_decay_every_step 7000 \
    --lr_decay_factor 0.33 --ppn_lambda lmd_coor=20 --save_interval 2000 \
    --n_step $N --log_interval 200 >> logs/ppn_r5coor_train.log 2>&1
  if grep -q "total_loss=nan" logs/ppn_r5coor_train.log; then
    echo "NAN DETECTED, aborting" >> logs/ppn_r5coor_train.log
    exit 1
  fi
done
echo "PPN R5COOR TRAINED" >> logs/ppn_r5coor_train.log

for N in 4000 8000 11000 14000; do
  timeout 3000 python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type Pifpaf \
    --model_name synth_pifpaf_fullres --batch_size 16 --lr_init 5e-4 \
    --lr_decay_every_step 6000 --lr_decay_factor 0.33 --save_interval 2000 \
    --n_step $N --log_interval 200 >> logs/pifpaf_fullres_train.log 2>&1
  if grep -q "=nan" logs/pifpaf_fullres_train.log; then
    echo "NAN DETECTED, aborting" >> logs/pifpaf_fullres_train.log
    exit 1
  fi
done
python eval.py --synthetic --dataset_path ./data_synth_1600 \
  --synthetic_train_scenes 1600 --model_type Pifpaf \
  --model_name synth_pifpaf_fullres --eval_num 100 \
  > logs/pifpaf_fullres_eval.log 2>&1
echo "QUEUE3C DONE" >> logs/pifpaf_fullres_eval.log
