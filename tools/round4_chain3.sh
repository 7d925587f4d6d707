#!/bin/bash
# Round-4 chain 3: flagship endgame on the MODEL-DOMAIN retrain
# (runs/big/model_md200), priority-ordered for the remaining wall clock
# (VERDICT r3 items 2/3/4):
#   1. ep200 held-out grid at deployment knobs (headline number)
#   2. gw-sweep knob re-derivation with the validation gate (item 4)
#   3. progressive distillation 64->4 + 8/4-step student grids (item 2)
#   4. late-epoch soup (ep150+175+200) + grid (item 2)
#   5. low-SNR fine-tune on train_pn155k.h5 from ep200 + grid (item 2)
#   6. serving export from ep200 + fetch-forced production-shape bench
#      (item 3: B=64, L=4096, 50 steps, avg8 — NOT the r3 toy shape)
#   7. spin sensitivity recheck
# Idempotent: completed artifacts are skipped on re-run.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 60
done
echo "[chain3] training done $(date -u +%H:%M:%S)"

FINAL=$MD/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$MD/model_diffusion.msgpack
# fall back to the newest periodic save if the run died mid-flight
[ -f "$FINAL" ] || FINAL=$(ls -t $MD/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
echo "[chain3] flagship = $FINAL"

OUT=runs/flagship/grid_md_ep200
if [ ! -f "$OUT/summary.json" ]; then
  echo "[chain3] grid eval ep200 $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS > /tmp/grid_md_ep200.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ep200 corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))"
fi

# seed-aggregation A/B at ep200: mf-weighted averaging vs the plain mean
# (same knobs otherwise — isolates the aggregate)
OUT=runs/flagship/grid_md_ep200_mfavg
if [ ! -f "$OUT/summary.json" ]; then
  echo "[chain3] grid eval ep200 avg-mode=mf $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS --avg-mode mf > /tmp/grid_md_ep200_mfavg.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ep200 mf-avg corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))"
fi

# knob re-derivation on the current flagship (validation gate on by default)
SW=runs/flagship/sweep_md_ep200
if [ ! -f "$SW/best_cmd.txt" ]; then
  echo "[chain3] gw-sweep knob re-derivation $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.sweep --input-h5 $EVAL --model "$FINAL" --outdir "$SW" \
    --indices 0 5 12 24 --n-coarse 48 --topk 4 --ladder lambda \
    --val-samples 16 --seed 0 > /tmp/sweep_md.log 2>&1
  tail -3 /tmp/sweep_md.log
fi

DIST=runs/big/distilled_md
if [ ! -f "$DIST/model_distilled_4step.msgpack" ]; then
  echo "[chain3] distilling from $FINAL $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.distill --teacher "$FINAL" --data runs/big/train_pn130k.h5 \
    --model_dir $DIST --steps-schedule 64,32,16,8,4 --epochs 1 \
    --batch-size 64 --ladder lambda --start-t 999 \
    --log-jsonl $DIST/distill.jsonl > /tmp/distill_md.log 2>&1
fi

for NS in 8 4; do
  CKPT=$DIST/model_distilled_${NS}step.msgpack
  OUT=runs/flagship/grid_md_distilled_${NS}step
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
    echo "[chain3] grid eval distilled ${NS}-step $(date -u +%H:%M:%S)"
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      --avg-seeds 8 --amp-calib mf > /tmp/grid_md_distilled_${NS}.log 2>&1
  fi
done

SOUP=runs/big/model_md200/soup_ep150_200.msgpack
if [ ! -f "$SOUP" ] && [ -f $MD/model_diffusion_ep150.msgpack ] \
   && [ -f $MD/model_diffusion_ep175.msgpack ]; then
  $PY -m $PKG.cli.soup --inputs \
    $MD/model_diffusion_ep150.msgpack \
    $MD/model_diffusion_ep175.msgpack \
    "$FINAL" --output "$SOUP" > /tmp/soup_md.log 2>&1
fi
OUT=runs/flagship/grid_md_soup
if [ -f "$SOUP" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[chain3] grid eval soup $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$SOUP" --outdir "$OUT" \
    $KNOBS > /tmp/grid_md_soup.log 2>&1
fi

FT=runs/big/model_md_ft_snr
if [ ! -f $FT/latest_model/model_diffusion.msgpack ]; then
  echo "[chain3] low-SNR fine-tune from $FINAL on 155k $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.train --data runs/big/train_pn155k.h5 \
    --model_dir $FT --epochs 10 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 --lr 5e-5 \
    --init-from "$FINAL" --save-every-epochs 10 \
    > /tmp/train_ft_md.log 2>&1
fi
CKPT=$FT/latest_model/model_diffusion.msgpack
OUT=runs/flagship/grid_md_ft_snr
if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[chain3] grid eval fine-tuned $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
    $KNOBS > /tmp/grid_ft_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ft corr', s.get('corr_macro_mean'), 'by_snr', \
[round(b['corr_mean'],3) for b in s.get('by_snr',[])])"
fi

SERVE=runs/flagship/serve/flagship_md_ep200.shlo
if [ ! -f "$SERVE" ]; then
  echo "[chain3] exporting flagship serving artifact $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.export --model "$FINAL" --output "$SERVE" \
    --batch-size 64 --length 4096 --platforms tpu,cpu \
    --steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf \
    > /tmp/export_md.log 2>&1 && tail -2 /tmp/export_md.log
fi
BS=runs/flagship/serve/bench_md_ep200.json
if [ -f "$SERVE" ] && [ ! -f "$BS" ]; then
  echo "[chain3] serving bench (TPU, production shape) $(date -u +%H:%M:%S)"
  $PY tools/bench_serving.py --artifact "$SERVE" --reps 3 \
    > "$BS" 2>/tmp/bench_serving_md.log && cat "$BS"
fi

SPIN=runs/flagship/spin_sensitivity_md_ep200.json
if [ ! -f "$SPIN" ]; then
  echo "[chain3] spin sensitivity $(date -u +%H:%M:%S)"
  $PY tools/spin_sensitivity.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$SPIN" 2>/tmp/spin_sens_md.log
fi
echo "[chain3] all done $(date -u +%H:%M:%S)"
