#!/bin/bash
# Experiment recipes — reference train_script.sh parity on the TPU CLI.
# Generator param counts match the reference ladder exactly
# (tests/test_networks.py pins them):
#   G9L3@64 = 730,713,346   G7L3@64 = 579,710,210   G5L3@64 = 428,707,074
#   G3L2@64 = 277,408,770   G3L2@48 = 156,050,690   G3L2@32 = 69,363,202
#   G3L2@24 = 39,020,930    G3L2@16 = 17,346,306    G3L2@8  = 4,339,330
# D @ (4ch in, ndf 64, 3 layers, num_D 2) = 5,531,522
set -e

COMMON="--no_instance --no_vgg_loss --label_nc 0 --output_nc 2 --input_nc 2 \
 --nThreads 16 --mask --mask_mode mode2 --netG local --abs_spectro --center \
 --explicit_encoding --validation_split 0.01"

# ---- HiFi-TTS pretrain ladder (reference train_script.sh:50-70)
python train.py --name mdct_hifitts_pha2_G3L2_48ngf --dataroot "$HIFITTS/audio.csv" \
  $COMMON --batchSize 32 --niter 10 --niter_decay 0 \
  --n_blocks_global 3 --n_blocks_local 2 --ngf 48

# ---- HiFi-TTS pretrain -> VCTK finetune at 6x with match loss
python train.py --name mdct_hifitts_phaloss_G3L2_48ngf_6x --dataroot "$HIFITTS/audio.csv" \
  $COMMON --batchSize 64 --niter 50 --niter_decay 50 \
  --n_blocks_global 3 --n_blocks_local 2 --ngf 48 --use_match_loss \
  --save_epoch_freq 40 --save_latest_freq 2000
python train.py --name hifitts_vctk_phaloss_G3L2_48ngf_6x --dataroot "$VCTK/train.csv" \
  --load_pretrain ./checkpoints/mdct_hifitts_phaloss_G3L2_48ngf_6x \
  $COMMON --batchSize 64 --niter 100 --niter_decay 50 \
  --n_blocks_global 3 --n_blocks_local 2 --ngf 48 --use_match_loss \
  --save_epoch_freq 40 --save_latest_freq 2000

# ---- VCTK 16 kHz -> 48 kHz (3x) variant
python train.py --name VCTK_G3L2_48ngf_3x --dataroot "$VCTK/wav48" \
  $COMMON --batchSize 64 --niter 50 --niter_decay 50 \
  --n_blocks_global 3 --n_blocks_local 2 --ngf 48 --lr_sampling_rate 16000

# ---- time-domain discriminator variant (reference hifitts_G3L2_48ngf_time_D)
python train.py --name hifitts_G3L2_48ngf_time_D --dataroot "$HIFITTS/audio.csv" \
  $COMMON --batchSize 32 --niter 100 --niter_decay 50 \
  --n_blocks_global 3 --n_blocks_local 2 --ngf 48 --use_time_D --lambda_time 10

# ---- evaluation + generation (reference eval_matric/generate recipes)
python eval_matric.py --name eval_hifitts_vctk --dataroot "$VCTK/test.csv" \
  --load_pretrain ./checkpoints/hifitts_vctk_phaloss_G3L2_48ngf_6x \
  $COMMON --batchSize 64 --niter 1 --validation_split 0
python generate_audio.py --name gen_vctk --dataroot "$VCTK/wav48/p225/p225_002.wav" \
  --load_pretrain ./checkpoints/hifitts_vctk_phaloss_G3L2_48ngf_6x \
  $COMMON --batchSize 4 --serial_batches --phase test --validation_split 0

# ---- Ablation ladder (reference test/ablation_study.sh): warm-start each
# HiFi-TTS pretrain and finetune at 2x (lr 24 kHz) across generator depths.
for CONF in "G7L3:7:3:64" "G5L3:5:3:64" "G3L2:3:2:64" "G3L2_48ngf:3:2:48"; do
  IFS=: read -r TAG GB LB NGF <<< "$CONF"
  python train.py --name "hifitts_vctk_pha2_${TAG}_2x" \
    --dataroot "$VCTK/train.csv" \
    --load_pretrain "./checkpoints/mdct_hifitts_pha2_${TAG}" \
    $COMMON --batchSize 32 --niter 20 --niter_decay 10 \
    --n_blocks_global "$GB" --n_blocks_local "$LB" --ngf "$NGF" \
    --lr_sampling_rate 24000 --save_epoch_freq 30
done
