#!/bin/bash
# Round-5b low-SNR fine-tune A/B (VERDICT r4 item 1's last unlanded row),
# scaled to the 20k A/B tier since the 155k corpus + flagship were wiped:
#   baseline = model_tap10 (uniform SNR 10-30), fine-tuned on a low-SNR
#   enriched corpus (SNR 8-18, same generator domain: taper 1.0), graded on
#   the SAME held-out grid -> does by_snr low-tercile corr move?
# Gen waits for the main CPU queue; the fine-tune is a TRAINING job so it
# waits for the 16 kHz trainer to release the chip (HBM trap).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/r5b_lowsnr.log
DEADLINE=1787185200   # ~00:20 UTC: no new TPU job

past_deadline() { [ "$(date -u +%s)" -ge "$DEADLINE" ]; }

while ! grep -q "ALL DONE" /tmp/r5b_gen.log 2>/dev/null; do
  past_deadline && exit 0; sleep 60; done

TRAIN=runs/big/train_lowsnr_20k.h5
if [ ! -f $TRAIN ]; then
  $PY -m $PKG.cli.gen --mode random --num-samples 20000 --save-psd \
    --output-path $TRAIN --f-taper-frac 1.0 \
    --snr-min 8 --snr-max 18 --progress-every 5000 \
    --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
    --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
    --seed 3 >> /tmp/r5b_gen_detail.log 2>&1 || exit 1
  echo "[lowsnr] corpus done $(date -u +%H:%M:%S)" | tee -a $LOG
fi

while ! grep -q "16k training done" /tmp/r5b_main.log 2>/dev/null; do
  past_deadline && exit 0; sleep 60; done

BASE=runs/big/model_tap10/latest_model/model_diffusion.msgpack
[ -f "$BASE" ] || BASE=$(ls -t runs/big/model_tap10/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
M=runs/big/model_tap10_lsft
CKPT=$M/latest_model/model_diffusion.msgpack
if [ -f "$BASE" ] && [ ! -f "$CKPT" ] && ! past_deadline; then
  echo "[lowsnr] fine-tune from $BASE $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1200 $PY -m $PKG.cli.train --data $TRAIN --model_dir $M \
    --init-from "$BASE" --epochs 10 --batch-size 64 --base_ch 64 \
    --pred_type v --whiten 1 --whiten_mode model --t_min_frac 0 \
    --lr 5e-5 --save-every-epochs 5 > /tmp/train_lsft.log 2>&1 \
    || echo "[lowsnr] ft rc=$?" | tee -a $LOG
fi
[ -f "$CKPT" ] || CKPT=$(ls -t $M/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_tap10_lsft
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[lowsnr] grid eval $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_tap10.h5 \
    --model "$CKPT" --outdir "$OUT" --steps 50 --ladder lambda --avg-seeds 4 \
    --amp-calib mf --start-t 999 > /tmp/grid_lsft.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[lowsnr] corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'), \
'by_snr', s.get('by_snr'))" | tee -a $LOG
fi
echo "[lowsnr] all done $(date -u +%H:%M:%S)" | tee -a $LOG
