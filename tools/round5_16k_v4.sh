#!/bin/bash
# Round-5 16 kHz push, attempt 4. v3 trained fine (max-len fix worked:
# buckets [16384, 32768], 24 steps/s, loss 0.0072@ep17) but WEDGED at
# ep18 when the endgame chain's taper-arm retraining took the chip past
# the HBM concurrency limit (16k job ~12.6-14.6 GB resident; any
# concurrent TRAINING job pushes past 15.75 GB and the axon client
# blocks instead of erroring — CLAUDE.md round-5 trap, re-confirmed).
# v4 lands the NUMBER: no more training; wait until the chain's last
# TRAINING arm (tapc1) has also finished its grid (only L=4096
# inference items remain after that — those coexisted with 16k work all
# session), then grid-eval the newest 16k checkpoint (ep16).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/16k.log
WAIT_DEADLINE=1787166000   # ~19:00 UTC: start the eval even if tapc1 lags

echo "[16k] v4: waiting for tapc1 grid (last training arm) $(date -u +%H:%M:%S)" | tee -a $LOG
while ! grep -q "tapc1 corr" /tmp/endgame.log 2>/dev/null \
      && [ "$(date -u +%s)" -lt "$WAIT_DEADLINE" ]; do
  sleep 30
done

M16=runs/big/model_16k_v3
CKPT=$(ls -t $M16/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_16k_md
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[16k] grid eval ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2400 $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_16k.h5 \
    --model "$CKPT" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 4 --amp-calib mf --start-t 999 \
    > /tmp/grid_16k_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[16k] corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi
echo "[16k] all done $(date -u +%H:%M:%S)" | tee -a $LOG
