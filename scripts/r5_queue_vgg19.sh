#!/bin/bash
# Round-5 TPU queue: finish VGG19 OpenPose segments (leak workaround), eval.
set -u
cd /root/repo

# wait for any running segment to finish
while pgrep -f "model_name synth_opps_vgg19" >/dev/null 2>&1; do sleep 30; done

for N in 14000 21000; do
  if grep -q "total_loss=nan" logs/opps_vgg19_seg1.log; then
    echo "NAN DETECTED before segment $N, aborting" >> logs/opps_vgg19_seg1.log
    exit 1
  fi
  python train.py --synthetic --dataset_path ./data_synth_1600 \
    --synthetic_train_scenes 1600 --model_type Openpose \
    --model_backbone Vgg19 --model_name synth_opps_vgg19 \
    --batch_size 16 --lr_init 2e-4 --lr_decay_every_step 10000 \
    --lr_decay_factor 0.33 --grad_clip_norm 1.0 \
    --n_step $N --log_interval 200 >> logs/opps_vgg19_seg1.log 2>&1
done

python eval.py --synthetic --dataset_path ./data_synth_1600 \
  --synthetic_train_scenes 1600 --model_type Openpose \
  --model_backbone Vgg19 --model_name synth_opps_vgg19 --eval_num 100 \
  > logs/opps_vgg19_eval.log 2>&1
echo "VGG19 QUEUE DONE" >> logs/opps_vgg19_eval.log
