#!/bin/bash
# Round-5 chain 4: 16 kHz quality push (VERDICT r4 item 2: corr_macro >=0.70
# vs r3's 0.592). Data (20k 16 kHz PN samples + held-out grid) already built
# by round4_chain4. This script:
#   - waits for the flagship TPU training AND the headline ep200 grid eval
#     (so the headline number lands at full speed),
#   - trains config-3 (attention+remat) on the 20k corpus, deadline-bounded
#     with periodic saves,
#   - grid-evals the newest checkpoint before the round-end bench window.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/chain4.log

TRAIN_DEADLINE=1787166000   # ~19:00 UTC: stop training, eval what we have
EVAL_DEADLINE=1787168400    # ~19:40 UTC: no new TPU job after this

TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 120
done
# give the headline grid the whole chip; bail out of the wait at 18:10 in
# case the grid job died
while [ ! -f runs/flagship/grid_md_ep200/summary.json ] \
      && [ "$(date -u +%s)" -lt 1787163000 ]; do
  sleep 60
done
echo "[chain4] starting 16 kHz training $(date -u +%H:%M:%S)" | tee -a $LOG

M16=runs/big/model_16k
if [ ! -f $M16/latest_model/model_diffusion.msgpack ]; then
  BUDGET=$(( TRAIN_DEADLINE - $(date -u +%s) ))
  [ "$BUDGET" -gt 300 ] && \
  timeout "$BUDGET" $PY -m $PKG.cli.train --data runs/big/train_16k20k.h5 \
    --model_dir $M16 --epochs 60 --batch-size 16 --base_ch 64 \
    --use-attention --remat --pred_type v --whiten 1 --whiten_mode model \
    --t_min_frac 0 --save-every-epochs 3 \
    > /tmp/train_16k.log 2>&1
fi

CKPT=$M16/latest_model/model_diffusion.msgpack
[ -f "$CKPT" ] || CKPT=$(ls -t $M16/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_16k_md
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] \
   && [ "$(date -u +%s)" -lt "$EVAL_DEADLINE" ]; then
  echo "[chain4] 16 kHz grid eval ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2100 $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_16k.h5 \
    --model "$CKPT" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 4 --amp-calib mf --start-t 999 \
    > /tmp/grid_16k_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain4] 16k corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi
echo "[chain4] all done $(date -u +%H:%M:%S)" | tee -a $LOG
