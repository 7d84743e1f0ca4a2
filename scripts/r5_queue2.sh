#!/bin/bash
# Round-5 TPU queue 2: flagship TinyVGG quick retrain (publishes
# weights/flagship_tinyvgg.npz) then the MobilenetDilated LW trained row.
set -u
cd /root/repo

# wait for the whole VGG19 queue (training segments + eval) to finish
while pgrep -f "r5_queue_vgg19.sh" >/dev/null 2>&1; do sleep 30; done
while pgrep -f "model_name synth_opps_vgg19" >/dev/null 2>&1; do sleep 30; done

# 1. flagship quick retrain: 12k in 2 segments + publish + eval
python scripts/retrain_flagship.py --quick --segment_steps 6000 \
  > logs/flagship_retrain.log 2>&1
echo "FLAGSHIP DONE rc=$?" >> logs/flagship_retrain.log

# 2. MobilenetDilated LW row (reference's LW default backbone): 20k, b16
for N in 7000 14000 20000; do
  python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type LightweightOpenpose \
    --model_backbone MobilenetDilated --model_name synth_lw_mbdilated \
    --batch_size 16 --lr_init 5e-4 --lr_decay_every_step 8000 \
    --lr_decay_factor 0.33 --n_step $N --log_interval 200 \
    >> logs/lw_mbdilated_train.log 2>&1
  if grep -q "total_loss=nan" logs/lw_mbdilated_train.log; then
    echo "NAN DETECTED, aborting" >> logs/lw_mbdilated_train.log
    exit 1
  fi
done
python eval.py --synthetic --dataset_path ./data_synth_1600 \
  --synthetic_train_scenes 1600 --model_type LightweightOpenpose \
  --model_backbone MobilenetDilated --model_name synth_lw_mbdilated \
  --eval_num 100 > logs/lw_mbdilated_eval.log 2>&1
echo "QUEUE2 DONE" >> logs/lw_mbdilated_eval.log
