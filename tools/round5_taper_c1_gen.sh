#!/bin/bash
# Third taper/attachment A/B arm: 20k corpus + evalgrid at the r5
# best-fidelity generator config (--f-taper-frac 0.85 --ringdown qnm_c1),
# same seeds/ranges as the other two arms (tools/round5_taper_ab_gen.sh).
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
COMMON="--snr-min 10 --snr-max 30 --progress-every 5000 \
  --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50"
LOG=/tmp/taper_ab_gen.log
TRAIN=runs/big/train_tapc1_20k.h5
if [ ! -f $TRAIN ]; then
  python -m $PKG.cli.gen --mode random --num-samples 20000 --save-psd \
    --output-path $TRAIN --f-taper-frac 0.85 --ringdown qnm_c1 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    $COMMON --seed 0 || exit 1
  echo "[taperab] train tapc1 done $(date -u +%H:%M:%S)" | tee -a $LOG
fi
EVAL=runs/flagship/evalgrid_tapc1.h5
if [ ! -f $EVAL ]; then
  python -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 \
    --save-psd --output-path $EVAL --f-taper-frac 0.85 --ringdown qnm_c1 \
    --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
    $COMMON --seed 7 || exit 1
  echo "[taperab] evalgrid tapc1 done $(date -u +%H:%M:%S)" | tee -a $LOG
fi
echo "[taperab] C1 ARM DONE $(date -u +%H:%M:%S)" | tee -a $LOG
