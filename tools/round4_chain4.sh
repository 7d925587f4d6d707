#!/bin/bash
# Round-4 chain 4: 16 kHz quality push (VERDICT r3 item 5: corr_macro >=0.70
# at 16 kHz vs 0.592 on 2k samples).  Lever = DATA: 20k PN samples at 16 kHz
# (10x the r3 corpus) + a proper 16 kHz held-out grid, then the config-3
# attention+remat model for 60 epochs (20k x 60 = 1.2M sample-views vs r3's
# 2k x 150 = 0.3M).
# Data gen runs on CPU immediately (overlaps flagship TPU training); the
# 16 kHz training waits for the flagship to free the TPU and then runs
# CONCURRENT with chain3's short eval jobs (known-safe ~2x timeshare).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
COMMON="--snr-min 10 --snr-max 30 --progress-every 5000 --sampling-rate 16384 --save-psd"

if [ ! -f runs/flagship/evalgrid_16k.h5 ]; then
  echo "[chain4] generating 16 kHz evalgrid $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.gen --mode grid --grid-steps 5 --num-samples 150 \
    --output-path runs/flagship/evalgrid_16k.h5 \
    --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
    --spin1-min -0.6 --spin1-max 0.6 --spin2-min -0.6 --spin2-max 0.6 \
    $COMMON --seed 17 > /tmp/gen_eval16k.log 2>&1 || exit 1
fi

if [ ! -f runs/big/train_16k20k.h5 ]; then
  echo "[chain4] generating 20k 16 kHz training samples $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.gen --mode random --num-samples 20000 \
    --output-path runs/big/train_16k20k.h5 \
    --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    $COMMON --seed 11 > /tmp/gen_16k20k.log 2>&1 || exit 1
  echo "[chain4] 16 kHz data done $(date -u +%H:%M:%S)"
fi

# wait for the flagship to free the TPU
TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 120
done
echo "[chain4] flagship done, starting 16 kHz training $(date -u +%H:%M:%S)"

M16=runs/big/model_16k
if [ ! -f $M16/latest_model/model_diffusion.msgpack ]; then
  $PY -m $PKG.cli.train --data runs/big/train_16k20k.h5 \
    --model_dir $M16 --epochs 60 --batch-size 16 --base_ch 64 \
    --use-attention --remat --pred_type v --whiten 1 --whiten_mode model \
    --t_min_frac 0 --save-every-epochs 20 \
    > /tmp/train_16k.log 2>&1
fi

CKPT=$M16/latest_model/model_diffusion.msgpack
[ -f "$CKPT" ] || CKPT=$(ls -t $M16/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_16k_md
if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[chain4] 16 kHz grid eval $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_16k.h5 \
    --model "$CKPT" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 4 --amp-calib mf --start-t 999 \
    > /tmp/grid_16k_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain4] 16k corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))"
fi
echo "[chain4] all done $(date -u +%H:%M:%S)"
