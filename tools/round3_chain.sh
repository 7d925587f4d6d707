#!/bin/bash
# Round-3 post-training chain: wait for the flagship resume (ep100->200) to
# finish, then evaluate ep150/ep200 on the held-out grid, distill the ep200
# model down the halving chain, and evaluate the distilled students.
# Each stage logs to /tmp/*.log; safe to re-run (skips completed artifacts).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MODEL_DIR=runs/big/model_pn128_130k/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

TRAIN_PID=$(cat /tmp/train_resume.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 60
done
echo "[chain] training done $(date -u +%H:%M:%S)"

for EP in 150 200; do
  CKPT=$MODEL_DIR/model_diffusion_ep${EP}.msgpack
  OUT=runs/flagship/grid_pn128_130k_ep${EP}
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
    echo "[chain] grid eval ep${EP}"
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      $KNOBS > /tmp/grid_ep${EP}.log 2>&1
  fi
done

FINAL=$MODEL_DIR/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$MODEL_DIR/model_diffusion.msgpack
DIST=runs/big/distilled_pn128
if [ ! -f "$DIST/model_distilled_4step.msgpack" ]; then
  echo "[chain] distilling from $FINAL"
  $PY -m $PKG.cli.distill --teacher "$FINAL" --data runs/big/train_pn130k.h5 \
    --model_dir $DIST --steps-schedule 64,32,16,8,4 --epochs 2 \
    --batch-size 64 --ladder lambda --start-t 999 \
    --log-jsonl $DIST/distill.jsonl > /tmp/distill.log 2>&1
fi

for NS in 8 4; do
  CKPT=$DIST/model_distilled_${NS}step.msgpack
  OUT=runs/flagship/grid_distilled_${NS}step
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
    echo "[chain] grid eval distilled ${NS}-step"
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      --avg-seeds 8 --amp-calib mf > /tmp/grid_distilled_${NS}.log 2>&1
  fi
done
echo "[chain] all done $(date -u +%H:%M:%S)"
