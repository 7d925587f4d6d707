#!/bin/bash
# Round-5 16 kHz push (VERDICT r4 item 2: corr_macro >=0.70 vs r3's 0.592),
# v2: runs CONCURRENTLY with round5_endgame.sh (2-way tunnel concurrency
# conserves aggregate throughput). Waits for the flagship trainer to be
# killed at ep175, gives the endgame's hbm microbench + headline-grid
# compile a 4-minute clean window, then trains config-3 (attention+remat)
# on the 20k 16 kHz corpus until the train deadline with periodic saves,
# and grid-evals the newest checkpoint.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/16k.log

TRAIN_DEADLINE=1787164800   # ~18:40 UTC
EVAL_DEADLINE=1787168700    # ~19:45 UTC

TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 30
done
sleep 240   # clean window for the hbm roof measurement
echo "[16k] starting 16 kHz training $(date -u +%H:%M:%S)" | tee -a $LOG

M16=runs/big/model_16k
if [ ! -f $M16/latest_model/model_diffusion.msgpack ]; then
  BUDGET=$(( TRAIN_DEADLINE - $(date -u +%s) ))
  [ "$BUDGET" -gt 300 ] && \
  timeout "$BUDGET" $PY -m $PKG.cli.train --data runs/big/train_16k20k.h5 \
    --model_dir $M16 --epochs 60 --batch-size 16 --base_ch 64 \
    --use-attention --remat --pred_type v --whiten 1 --whiten_mode model \
    --t_min_frac 0 --save-every-epochs 2 \
    > /tmp/train_16k.log 2>&1
fi

CKPT=$M16/latest_model/model_diffusion.msgpack
[ -f "$CKPT" ] || CKPT=$(ls -t $M16/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_16k_md
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] \
   && [ "$(date -u +%s)" -lt "$EVAL_DEADLINE" ]; then
  echo "[16k] grid eval ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2100 $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_16k.h5 \
    --model "$CKPT" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 4 --amp-calib mf --start-t 999 \
    > /tmp/grid_16k_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[16k] corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi
echo "[16k] all done $(date -u +%H:%M:%S)" | tee -a $LOG
