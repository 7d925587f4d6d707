#!/bin/bash
# Round-5b TPU aux chain: 4 kHz INFERENCE work, run concurrently with the
# 16 kHz trainer (inference + 16k training coexist in HBM; two trainings
# don't). Gates on the main chain's "taper trains done" sentinel.
#   - taper/attachment A/B grids (VERDICT r4 item 5, end-to-end quality delta)
#   - glitch-robustness table at scale (item 7)
#   - deployment-knob sweep with the validation gate (item 4)
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/r5b_aux.log
DEADLINE=1787185200   # ~00:20 UTC: no new TPU job

past_deadline() { [ "$(date -u +%s)" -ge "$DEADLINE" ]; }

while ! grep -q "taper trains done" /tmp/r5b_main.log 2>/dev/null; do
  past_deadline && exit 0
  sleep 30
done

ckpt_for () {
  local M=runs/big/model_tap$1
  local C=$M/latest_model/model_diffusion.msgpack
  [ -f "$C" ] || C=$(ls -t $M/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
  echo "$C"
}

# ---- 1. taper A/B grids ----
for TAG in 10 085 c1; do
  CKPT=$(ckpt_for $TAG)
  EV=runs/flagship/evalgrid_tap${TAG}.h5
  OUT=runs/flagship/grid_tap${TAG}
  if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ -f "$EV" ] \
     && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
    echo "[aux] grid tap$TAG $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout 1800 $PY -m $PKG.cli.grid --input-h5 $EV --model "$CKPT" \
      --outdir "$OUT" --steps 50 --ladder lambda --avg-seeds 4 \
      --amp-calib mf --start-t 999 > /tmp/grid_tap${TAG}.log 2>&1
    $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[aux] tap$TAG corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
  fi
done

# ---- 2. glitch robustness at scale (tap10 = legacy-generator model) ----
CKPT=$(ckpt_for 10)
OUT=runs/flagship/glitch_tap10.json
if [ -f "$CKPT" ] && [ ! -f "$OUT" ] && ! past_deadline; then
  echo "[aux] glitch robustness $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY tools/glitch_robustness.py \
    --input-h5 runs/flagship/evalgrid_tap10.h5 --model "$CKPT" \
    --steps 50 --avg-seeds 4 --start-t 999 > "$OUT" 2>/tmp/glitch_tap10.log \
    || echo "[aux] glitch FAILED/timeout" | tee -a $LOG
  tail -2 "$OUT" 2>/dev/null | tee -a $LOG
fi

# ---- 3. deployment-knob sweep with the validation gate ----
SW=runs/flagship/sweep_tap10
if [ -f "$CKPT" ] && [ ! -f "$SW/best_cmd.txt" ] && ! past_deadline; then
  echo "[aux] knob sweep (gated) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2400 $PY -m $PKG.cli.sweep \
    --input-h5 runs/flagship/evalgrid_tap10.h5 --model "$CKPT" \
    --outdir "$SW" --indices 0 5 12 24 --n-coarse 24 --topk 3 \
    --ladder lambda --val-samples 16 --seed 0 > /tmp/sweep_tap10.log 2>&1 \
    || echo "[aux] sweep rc=$?" | tee -a $LOG
  tail -3 /tmp/sweep_tap10.log | tee -a $LOG
fi
echo "[aux] all done $(date -u +%H:%M:%S)" | tee -a $LOG
