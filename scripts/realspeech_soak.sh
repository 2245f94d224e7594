#!/bin/bash
# Real-speech micro-soak — the exact commands behind BASELINE.md
# "Real-speech quality numbers" (rounds 3 and 5).
#
# The environment has no VCTK (zero egress; fetch failure recorded in
# BASELINE.md), so tools/prep_realspeech.py windows the reference's
# committed real 48 kHz speech (/root/reference/test/test.wav +
# generated/GEN_VCTK_G3L2_48ngf/hr_audio.wav) into 160 flagship-shaped
# segments with two held-out tails that share no samples with training.
# Recipe = the flagship VCTK_G3L2_48ngf production config
# (scripts/train_recipes.sh Family F) at micro-corpus scale:
# 128 train / 32 val files, batch 64 -> 2 steps/epoch, 200 epochs,
# fix-global 30, LR decay from epoch 150. ~55 min on one v5e warm-cache.
set -e

CORPUS=${CORPUS:-/tmp/realspeech}
CKPT=${CKPT:-/tmp/realspeech_ck}
NAME=${NAME:-rs_soak}
# round 5: add --include_sr_variants to prep for the augmented
# (data-limited-hypothesis) variant — same held-out files either way.
python tools/prep_realspeech.py --out "$CORPUS" "$@"

FLAGSHIP="--no_instance --no_vgg_loss --label_nc 0 --output_nc 2 --input_nc 2 \
 --nThreads 16 --mask --mask_mode mode2 --netG local --abs_spectro --center \
 --explicit_encoding --n_blocks_global 3 --n_blocks_local 2 --ngf 48 \
 --use_match_loss"

python train.py --name "$NAME" --checkpoints_dir "$CKPT" \
  --dataroot "$CORPUS/train" $FLAGSHIP \
  --batchSize 64 --niter 150 --niter_decay 50 --niter_fix_global 30 \
  --validation_split 0.2 --eval_freq 1280 --eval_size 32 \
  --save_latest_freq 2560 --save_epoch_freq 100 --print_freq 256

# Held-out eval: the two tail files, never seen in training.
python eval_matric.py --name "${NAME}_eval" --checkpoints_dir "$CKPT" \
  --dataroot "$CORPUS/eval" --load_pretrain "$CKPT/$NAME" $FLAGSHIP \
  --batchSize 2 --niter 1 --validation_split 0
