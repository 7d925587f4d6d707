#!/bin/bash
# Round-4 recovery supervisor (5th VM rebuild: runs/ wiped again).
# Sequence (single CPU core -> heavy host jobs strictly serialised):
#   1. regen_round3.sh  -> evalgrid_pn.h5 + train_pn130k.h5 (CPU, ~40-60 min)
#   2. launch flagship model-domain retrain runs/big/model_md200 (TPU)
#   3. 25k low-SNR top-up (--save-psd this time) + merge -> train_pn155k.h5
#   4. chain2 (ep25/ep100 trajectory grids), chain3 (endgame), chain4 (16 kHz)
#      launch themselves off /tmp/train_md200.pid and sentinels.
# Idempotent: every artifact is gated on existence.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu

if ! grep -q "ALL DONE" /tmp/regen.log 2>/dev/null; then
  bash tools/regen_round3.sh > /tmp/regen.log 2>&1
fi
grep -q "ALL DONE" /tmp/regen.log || { echo "[r4sup] regen FAILED"; exit 1; }
echo "[r4sup] data ready $(date -u +%H:%M:%S)"

# 2. flagship training on TPU (model domain is now REAL: derived analytic PSD)
if [ ! -f runs/big/model_md200/latest_model/model_diffusion.msgpack ] \
   && ! kill -0 "$(cat /tmp/train_md200.pid 2>/dev/null)" 2>/dev/null; then
  nohup $PY -m $PKG.cli.train \
    --data runs/big/train_pn130k.h5 \
    --model_dir runs/big/model_md200 \
    --epochs 200 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 \
    --save-every-epochs 25 \
    > /tmp/train_md200.log 2>&1 &
  echo $! > /tmp/train_md200.pid
  echo "[r4sup] flagship training pid $(cat /tmp/train_md200.pid) $(date -u +%H:%M:%S)"
fi

# 3. 155k low-SNR corpus (CPU; overlaps TPU training)
if [ ! -f runs/big/train_pn155k.h5 ]; then
  if [ ! -f runs/big/train_pnsnr25k.h5 ]; then
    echo "[r4sup] generating 25k low-SNR top-up $(date -u +%H:%M:%S)"
    $PY -m $PKG.cli.gen --mode random --num-samples 25000 --save-psd \
      --output-path runs/big/train_pnsnr25k.h5 \
      --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
      --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
      --snr-min 10 --snr-max 18 --progress-every 10000 --seed 2 \
      > /tmp/gen_snr25k.log 2>&1 || exit 1
  fi
  echo "[r4sup] merging -> train_pn155k.h5 $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.merge runs/big/train_pn130k.h5 runs/big/train_pnsnr25k.h5 \
    --output-path runs/big/train_pn155k.h5 > /tmp/merge155k.log 2>&1 || exit 1
  rm -f runs/big/train_pnsnr25k.h5
fi
echo "[r4sup] 155k ready $(date -u +%H:%M:%S)"
echo "[r4sup] all done $(date -u +%H:%M:%S)"
