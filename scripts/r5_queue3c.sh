#!/bin/bash
# Round-5 TPU queue 3c: PPN lambda_coor attack (20k), then PifPaf full-res.
# 5k segments + save_interval 2000: a wedged tunnel RPC loses <=2k steps.
set -u
cd /root/repo
mv logs/ppn_r5coor_train.log logs/ppn_r5coor_train.log.stalled 2>/dev/null

for N in 5000 10000 15000 20000; do
  python train.py --synthetic --dataset_path ./data_synth_1600 \
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

for N in 5000 10000 14000; do
  python train.py --synthetic --dataset_path ./data_synth_1600 \
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
