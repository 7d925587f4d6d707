#!/bin/bash
# Round-3 post-training chain, priority-ordered for the remaining wall clock:
# 1. ep200 held-out grid eval (headline number)
# 2. progressive distillation from ep200 (1 epoch/stage halving chain)
# 3. distilled-student grid evals (8-step, 4-step)
# 4. knob-matrix evals (avg16, median) — only reached if time remains
# Idempotent: completed artifacts are skipped on re-run.
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

FINAL=$MODEL_DIR/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$MODEL_DIR/model_diffusion.msgpack

OUT=runs/flagship/grid_pn128_130k_ep200
if [ ! -f "$OUT/summary.json" ]; then
  echo "[chain] grid eval ep200"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS > /tmp/grid_ep200.log 2>&1
fi

DIST=runs/big/distilled_pn128
if [ ! -f "$DIST/model_distilled_4step.msgpack" ]; then
  echo "[chain] distilling from $FINAL"
  $PY -m $PKG.cli.distill --teacher "$FINAL" --data runs/big/train_pn130k.h5 \
    --model_dir $DIST --steps-schedule 64,32,16,8,4 --epochs 1 \
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

OUT=runs/flagship/grid_pn128_130k_ep200_avg8med
if [ ! -f "$OUT/summary.json" ]; then
  echo "[chain] grid eval ep200 median aggregate"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS --avg-mode median > /tmp/grid_ep200_med.log 2>&1
fi

OUT=runs/flagship/grid_pn128_130k_ep200_avg16
if [ ! -f "$OUT/summary.json" ]; then
  echo "[chain] grid eval ep200 avg16"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    --steps 50 --ladder lambda --avg-seeds 16 --amp-calib mf --start-t 999 \
    > /tmp/grid_ep200_avg16.log 2>&1
fi
echo "[chain] all done $(date -u +%H:%M:%S)"
