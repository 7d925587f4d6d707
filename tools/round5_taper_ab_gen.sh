#!/bin/bash
# Round-5 taper A/B data (VERDICT r4 item 5): two 20k corpora + two 150-sample
# evalgrids, identical seeds/ranges, differing ONLY in --f-taper-frac
# (legacy 1.0 in-band turn-on vs 0.85 below-band half-Hann).  Both use the
# post-fix bracketed invert_tau (the current generator), so a same-config
# retrain on each isolates the data-fidelity effect of the taper.
# CPU-only (on-device rfft at L>=8192 wedges the TPU tunnel).  Idempotent.
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
COMMON="--snr-min 10 --snr-max 30 --progress-every 5000 \
  --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50"
LOG=/tmp/taper_ab_gen.log

for TAP in 1.0 0.85; do
  TAG=$(echo $TAP | tr -d .)
  TRAIN=runs/big/train_tap${TAG}_20k.h5
  if [ ! -f $TRAIN ]; then
    python -m $PKG.cli.gen --mode random --num-samples 20000 --save-psd \
      --output-path $TRAIN --f-taper-frac $TAP \
      --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
      $COMMON --seed 0 || exit 1
    echo "[taperab] train taper=$TAP done $(date -u +%H:%M:%S)" | tee -a $LOG
  fi
  EVAL=runs/flagship/evalgrid_tap${TAG}.h5
  if [ ! -f $EVAL ]; then
    python -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 \
      --save-psd --output-path $EVAL --f-taper-frac $TAP \
      --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
      $COMMON --seed 7 || exit 1
    echo "[taperab] evalgrid taper=$TAP done $(date -u +%H:%M:%S)" | tee -a $LOG
  fi
done
echo "[taperab] ALL DONE $(date -u +%H:%M:%S)" | tee -a $LOG
