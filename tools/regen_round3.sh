#!/bin/bash
# Regenerate the round-3 QNM-consistent corpus after a VM rebuild.
# Everything runs on CPU (on-device rfft at L>=8192 wedges the TPU tunnel).
# Order: evalgrid first (fast, unblocks eval plumbing), then 100k uniform,
# 30k low-mass top-up, merge -> train_pn130k.h5.  Idempotent per artifact.
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
COMMON="--snr-min 10 --snr-max 30 --progress-every 10000"

if [ ! -f runs/flagship/evalgrid_pn.h5 ]; then
  python -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 --save-psd \
    --output-path runs/flagship/evalgrid_pn.h5 \
    --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
    --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
    $COMMON --seed 7 || exit 1
  echo "[regen] evalgrid done $(date -u +%H:%M:%S)"
fi

if [ ! -f runs/big/train_pn100k.h5 ] && [ ! -f runs/big/train_pn130k.h5 ]; then
  python -m $PKG.cli.gen --mode random --num-samples 100000 --save-psd \
    --output-path runs/big/train_pn100k.h5 \
    --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    $COMMON --seed 0 || exit 1
  echo "[regen] 100k done $(date -u +%H:%M:%S)"
fi

if [ ! -f runs/big/train_pnlow30k.h5 ] && [ ! -f runs/big/train_pn130k.h5 ]; then
  python -m $PKG.cli.gen --mode random --num-samples 30000 --save-psd \
    --output-path runs/big/train_pnlow30k.h5 \
    --mass1-min 20 --mass1-max 36 --mass2-min 20 --mass2-max 36 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    $COMMON --seed 1 || exit 1
  echo "[regen] low-mass 30k done $(date -u +%H:%M:%S)"
fi

if [ ! -f runs/big/train_pn130k.h5 ]; then
  python -m $PKG.cli.merge runs/big/train_pn100k.h5 runs/big/train_pnlow30k.h5 \
    --output-path runs/big/train_pn130k.h5 || exit 1
  rm -f runs/big/train_pn100k.h5 runs/big/train_pnlow30k.h5
  echo "[regen] merge done $(date -u +%H:%M:%S)"
fi
echo "[regen] ALL DONE $(date -u +%H:%M:%S)"
