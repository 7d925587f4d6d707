#!/bin/bash
# Round-5b (post-7th-rebuild) CPU data-gen queue. Order matters on the single
# core: tap10 first (unblocks the TPU taper trains), then the 16 kHz corpora
# (gates the long TPU job), then the remaining taper arms.
# Idempotent; logs to /tmp/r5b_gen.log.
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/r5b_gen.log
COMMON4="--snr-min 10 --snr-max 30 --progress-every 5000 \
  --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50"
COMMON16="--snr-min 10 --snr-max 30 --progress-every 5000 --sampling-rate 16384 --save-psd \
  --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50"
mkdir -p runs/big runs/flagship

gen_arm () {  # TAG EXTRA_FLAGS
  local TAG=$1; shift
  local TRAIN=runs/big/train_tap${TAG}_20k.h5
  local EVAL=runs/flagship/evalgrid_tap${TAG}.h5
  if [ ! -f $TRAIN ]; then
    python -m $PKG.cli.gen --mode random --num-samples 20000 --save-psd \
      --output-path $TRAIN "$@" \
      --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
      $COMMON4 --seed 0 >> /tmp/r5b_gen_detail.log 2>&1 || exit 1
    echo "[gen] train tap$TAG done $(date -u +%H:%M:%S)" | tee -a $LOG
  fi
  if [ ! -f $EVAL ]; then
    python -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 \
      --save-psd --output-path $EVAL "$@" \
      --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
      $COMMON4 --seed 7 >> /tmp/r5b_gen_detail.log 2>&1 || exit 1
    echo "[gen] evalgrid tap$TAG done $(date -u +%H:%M:%S)" | tee -a $LOG
  fi
}

echo "[gen] start $(date -u +%H:%M:%S)" | tee -a $LOG
gen_arm 10 --f-taper-frac 1.0

if [ ! -f runs/flagship/evalgrid_16k.h5 ]; then
  python -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 \
    --output-path runs/flagship/evalgrid_16k.h5 \
    --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
    $COMMON16 --seed 17 >> /tmp/r5b_gen_detail.log 2>&1 || exit 1
  echo "[gen] evalgrid_16k done $(date -u +%H:%M:%S)" | tee -a $LOG
fi
if [ ! -f runs/big/train_16k20k.h5 ]; then
  python -m $PKG.cli.gen --mode random --num-samples 20000 \
    --output-path runs/big/train_16k20k.h5 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    $COMMON16 --seed 11 >> /tmp/r5b_gen_detail.log 2>&1 || exit 1
  echo "[gen] train_16k20k done $(date -u +%H:%M:%S)" | tee -a $LOG
fi

gen_arm 085 --f-taper-frac 0.85
gen_arm c1 --f-taper-frac 0.85 --ringdown qnm_c1

echo "[gen] ALL DONE $(date -u +%H:%M:%S)" | tee -a $LOG
