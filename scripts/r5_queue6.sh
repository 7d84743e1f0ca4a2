#!/bin/bash
# Round-5 queue 6: real-TPU ImageNet-pretrain run (ACCURACY row), then
# the domain-adaptation convergence demo — plain vs dmadapt LW-TinyVGG
# at identical recipes, so the demo shows (a) the adversarial loop
# trains (disc/gen losses move) and (b) AP does not regress.
set -u
cd /root/repo
mkdir -p logs

# 1. backbone pretrain on the synthetic ImageNet twin (real TPU)
timeout 1200 python pretrain.py --synthetic --model_backbone Vggtiny \
  --batch_size 32 --n_step 800 --lr_init 1e-3 --log_interval 50 \
  --val_interval 200 --save_interval 800 \
  > logs/pretrain_run.log 2>&1
echo "PRETRAIN DONE rc=$?" >> logs/pretrain_run.log

# 2. plain 2.5k LW-TinyVGG baseline (same recipe as the dmadapt run)
timeout 2400 python train.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_plain \
  --batch_size 16 --lr_init 5e-4 --n_step 2500 --log_interval 100 \
  > logs/lw_plain_train.log 2>&1
timeout 1200 python eval.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_plain --eval_num 100 \
  > logs/lw_plain_eval.log 2>&1

# 3. domain-adapt run: same recipe + unlabeled domain-shifted split
timeout 2400 python train.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_dmadapt \
  --domainadapt_data_path ./data_dmadapt \
  --batch_size 16 --lr_init 5e-4 --n_step 2500 --log_interval 100 \
  > logs/lw_dmadapt_train.log 2>&1
timeout 1200 python eval.py --synthetic --model_type LightweightOpenpose \
  --model_backbone Vggtiny --model_name synth_lw_dmadapt --eval_num 100 \
  > logs/lw_dmadapt_eval.log 2>&1
echo "QUEUE6 DONE" >> logs/lw_dmadapt_eval.log
