#!/bin/bash
# Round-5 TPU queue 4: ImageNet-pretrain ACCURACY run, domain-adapt
# convergence demo (plain 5k baseline vs dmadapt 5k), finetune smoke.
set -u
cd /root/repo

while pgrep -f "r5_queue3d.sh" >/dev/null 2>&1; do sleep 30; done

# 1. backbone pretrain on the synthetic ImageNet twin (real TPU run)
python pretrain.py --synthetic --model_backbone Vggtiny \
  --batch_size 32 --n_step 800 --lr_init 1e-3 --log_interval 50 \
  --val_interval 200 --save_interval 800 \
  > logs/pretrain_run.log 2>&1
echo "PRETRAIN DONE rc=$?" >> logs/pretrain_run.log

# 2. plain 5k LW-TinyVGG baseline (same recipe as the dmadapt run)
python train.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_plain \
  --batch_size 16 --lr_init 5e-4 --n_step 3500 --log_interval 200 \
  > logs/lw_plain_train.log 2>&1
python eval.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_plain --eval_num 100 \
  > logs/lw_plain_eval.log 2>&1

# 3. domain-adapt run: same recipe + unlabeled domain-shifted split
python train.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_dmadapt \
  --domainadapt_data_path ./data_dmadapt \
  --batch_size 16 --lr_init 5e-4 --n_step 3500 --log_interval 200 \
  > logs/lw_dmadapt_train.log 2>&1
python eval.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_dmadapt --eval_num 100 \
  > logs/lw_dmadapt_eval.log 2>&1
echo "QUEUE4 DONE" >> logs/lw_dmadapt_eval.log
