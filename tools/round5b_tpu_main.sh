#!/bin/bash
# Round-5b TPU main chain: the three short taper-arm trainings first (two
# trainings never share the chip), then the long 16 kHz training, then the
# 16 kHz grid eval. 4 kHz INFERENCE (round5b_tpu_aux.sh) runs concurrently
# with the 16 kHz trainer — that pairing coexisted all last session; only
# concurrent TRAINING wedges the tunnel (CLAUDE.md HBM trap).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
LOG=/tmp/r5b_main.log

TRAIN16_DEADLINE=1787183100   # ~23:45 UTC: stop 16k training, eval what exists
EVAL_DEADLINE=1787185200      # ~00:20 UTC: no new TPU job after this

# Gate on the gen chain's COMPLETION sentinel, not file existence: the HDF5
# appears at creation and gen holds the h5py write lock until done (the
# existence-gated v1 of this script raced exactly there).
wait_for_sentinel () { while ! grep -q "$1" /tmp/r5b_gen.log 2>/dev/null; do sleep 20; done; }

# ---- 1. taper-arm trainings (serialized; identical config, corpus differs) ----
for TAG in 10 085 c1; do
  TR=runs/big/train_tap${TAG}_20k.h5
  M=runs/big/model_tap${TAG}
  CKPT=$M/latest_model/model_diffusion.msgpack
  wait_for_sentinel "train tap$TAG done"
  if [ ! -f "$CKPT" ]; then
    echo "[main] train tap$TAG $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout 1500 $PY -m $PKG.cli.train --data $TR --model_dir $M \
      --epochs 30 --batch-size 64 --base_ch 64 --pred_type v \
      --whiten 1 --whiten_mode model --t_min_frac 0 \
      --save-every-epochs 10 > /tmp/train_tap${TAG}.log 2>&1 \
      || echo "[main] train tap$TAG rc=$? (eval whatever saved)" | tee -a $LOG
  fi
done
echo "[main] taper trains done $(date -u +%H:%M:%S)" | tee -a $LOG

# ---- 2. 16 kHz training (v3 recipe: max-len 32768 kills the 65536 bucket) ----
M16=runs/big/model_16k
wait_for_sentinel "train_16k20k done"
if [ ! -f $M16/latest_model/model_diffusion.msgpack ]; then
  for BS in 8 4; do
    BUDGET=$(( TRAIN16_DEADLINE - $(date -u +%s) ))
    [ "$BUDGET" -gt 300 ] || break
    echo "[main] 16k training batch=$BS budget=${BUDGET}s $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout "$BUDGET" $PY -m $PKG.cli.train --data runs/big/train_16k20k.h5 \
      --model_dir $M16 --epochs 70 --batch-size $BS --base_ch 64 \
      --use-attention --remat --max-len 32768 --pred_type v \
      --whiten 1 --whiten_mode model --t_min_frac 0 --save-every-epochs 2 \
      > /tmp/train_16k_b$BS.log 2>&1
    RC=$?
    if [ -n "$(ls $M16/latest_model/model_diffusion*.msgpack 2>/dev/null)" ] \
       || [ "$RC" = 124 ] || [ "$RC" = 0 ]; then
      break
    fi
    echo "[main] 16k batch=$BS failed rc=$RC; retrying smaller" | tee -a $LOG
  done
fi
echo "[main] 16k training done $(date -u +%H:%M:%S)" | tee -a $LOG

# ---- 3. 16 kHz grid eval ----
CKPT=$M16/latest_model/model_diffusion.msgpack
[ -f "$CKPT" ] || CKPT=$(ls -t $M16/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_16k_md
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] \
   && [ "$(date -u +%s)" -lt "$EVAL_DEADLINE" ]; then
  echo "[main] 16k grid eval ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2400 $PY -m $PKG.cli.grid --input-h5 runs/flagship/evalgrid_16k.h5 \
    --model "$CKPT" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 4 --amp-calib mf --start-t 999 \
    > /tmp/grid_16k_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[main] 16k corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi
echo "[main] all done $(date -u +%H:%M:%S)" | tee -a $LOG
