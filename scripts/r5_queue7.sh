#!/bin/bash
# Round-5 queue 7: PifPaf at the reference's full 432x368 (VERDICT
# missing #4). Trains in tunnel-safe segments with an eval after each
# milestone so a partial run still yields a committable ACCURACY row.
set -u
cd /root/repo
mkdir -p logs

for N in 2000 4000 6000 8000 10000 12000 14000; do
  timeout 2400 python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type Pifpaf \
    --model_name synth_pifpaf_fullres --batch_size 16 --lr_init 5e-4 \
    --lr_decay_every_step 6000 --lr_decay_factor 0.33 --save_interval 2000 \
    --n_step $N --log_interval 100 >> logs/pifpaf_fullres_train.log 2>&1
  if grep -q "=nan" logs/pifpaf_fullres_train.log; then
    echo "NAN DETECTED, aborting" >> logs/pifpaf_fullres_train.log
    exit 1
  fi
  case $N in
    6000|10000|14000)
      timeout 1800 python eval.py --synthetic --dataset_path ./data_synth_1600 \
        --synthetic_train_scenes 1600 --model_type Pifpaf \
        --model_name synth_pifpaf_fullres --eval_num 100 \
        > logs/pifpaf_fullres_eval_$N.log 2>&1
      echo "EVAL $N rc=$?" >> logs/pifpaf_fullres_train.log
      ;;
  esac
done
echo "QUEUE7 DONE" >> logs/pifpaf_fullres_train.log
