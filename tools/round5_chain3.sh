#!/bin/bash
# Round-5 chain 3: flagship endgame, re-ordered to land VERDICT r4's
# priorities within the remaining wall clock (round ends ~20:16 UTC):
#   1. ep200 held-out grid (headline)            — item 1
#   2. serving export + production-shape bench   — item 3 (fast, high value)
#   3. distillation + 8/4-step student grids     — item 1
#   4. late-epoch soup + grid                    — item 1
#   5. --avg-mode mf A/B grid                    — item 1
#   6. low-SNR fine-tune (155k) + grid           — item 1
#   7. reduced gw-sweep knob re-derivation       — item 4
#   8. spin sensitivity
# Every job checks an absolute deadline before starting so the TPU is free
# for the driver's bench.py at round end. Idempotent: completed artifacts
# are skipped on re-run.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"
LOG=/tmp/chain3.log   # keep the round-4 sentinel path: chain5 greps it

# no NEW job may start after this (driver bench needs the chip by 20:16)
DEADLINE=1787168400   # ~19:40 UTC
past_deadline() { [ "$(date -u +%s)" -ge "$DEADLINE" ]; }

TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
while [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 60
done
echo "[chain3] training done $(date -u +%H:%M:%S)" | tee -a $LOG

FINAL=$MD/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$MD/model_diffusion.msgpack
[ -f "$FINAL" ] || FINAL=$(ls -t $MD/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
echo "[chain3] flagship = $FINAL" | tee -a $LOG

# ---- 1. headline grid (runs ALONE: chain4 waits for its summary.json) ----
OUT=runs/flagship/grid_md_ep200
if [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[chain3] grid eval ep200 $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS > /tmp/grid_md_ep200.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ep200 corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 2. serving export + fetch-forced production-shape bench ----
SERVE=runs/flagship/serve/flagship_md_ep200.shlo
if [ ! -f "$SERVE" ] && ! past_deadline; then
  echo "[chain3] exporting flagship serving artifact $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.export --model "$FINAL" --output "$SERVE" \
    --batch-size 64 --length 4096 --platforms tpu,cpu \
    --steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf \
    > /tmp/export_md.log 2>&1 && tail -2 /tmp/export_md.log | tee -a $LOG
fi
BS=runs/flagship/serve/bench_md_ep200.json
if [ -f "$SERVE" ] && [ ! -f "$BS" ] && ! past_deadline; then
  echo "[chain3] serving bench (TPU, production shape) $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY tools/bench_serving.py --artifact "$SERVE" --reps 3 \
    > "$BS" 2>/tmp/bench_serving_md.log && cat "$BS" | tee -a $LOG
fi

# ---- 3. progressive distillation + student grids ----
DIST=runs/big/distilled_md
if [ ! -f "$DIST/model_distilled_4step.msgpack" ] && ! past_deadline; then
  echo "[chain3] distilling from $FINAL $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.distill --teacher "$FINAL" --data runs/big/train_pn130k.h5 \
    --model_dir $DIST --steps-schedule 64,32,16,8,4 --epochs 1 \
    --batch-size 64 --ladder lambda --start-t 999 \
    --log-jsonl $DIST/distill.jsonl > /tmp/distill_md.log 2>&1
fi
for NS in 8 4; do
  CKPT=$DIST/model_distilled_${NS}step.msgpack
  OUT=runs/flagship/grid_md_distilled_${NS}step
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
    echo "[chain3] grid eval distilled ${NS}-step $(date -u +%H:%M:%S)" | tee -a $LOG
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      --avg-seeds 8 --amp-calib mf > /tmp/grid_md_distilled_${NS}.log 2>&1
    $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] distilled ${NS}-step corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
  fi
done

# ---- 4. late-epoch soup ----
SOUP=runs/big/model_md200/soup_ep150_200.msgpack
if [ ! -f "$SOUP" ] && [ -f $MD/model_diffusion_ep150.msgpack ] \
   && [ -f $MD/model_diffusion_ep175.msgpack ] && ! past_deadline; then
  $PY -m $PKG.cli.soup --inputs \
    $MD/model_diffusion_ep150.msgpack \
    $MD/model_diffusion_ep175.msgpack \
    "$FINAL" --output "$SOUP" > /tmp/soup_md.log 2>&1
fi
OUT=runs/flagship/grid_md_soup
if [ -f "$SOUP" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[chain3] grid eval soup $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$SOUP" --outdir "$OUT" \
    $KNOBS > /tmp/grid_md_soup.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] soup corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 5. seed-aggregation A/B (mf-weighted vs plain mean) ----
OUT=runs/flagship/grid_md_ep200_mfavg
if [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[chain3] grid eval ep200 avg-mode=mf $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" --outdir "$OUT" \
    $KNOBS --avg-mode mf > /tmp/grid_md_ep200_mfavg.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ep200 mf-avg corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 6. low-SNR fine-tune (155k) + grid ----
FT=runs/big/model_md_ft_snr
CKPT=$FT/latest_model/model_diffusion.msgpack
if [ ! -f "$CKPT" ] && ! past_deadline; then
  echo "[chain3] low-SNR fine-tune from $FINAL on 155k $(date -u +%H:%M:%S)" | tee -a $LOG
  # 6 epochs, periodic saves: deadline-robust (grid falls back to newest save)
  timeout 3300 $PY -m $PKG.cli.train --data runs/big/train_pn155k.h5 \
    --model_dir $FT --epochs 6 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 --lr 5e-5 \
    --init-from "$FINAL" --save-every-epochs 2 \
    > /tmp/train_ft_md.log 2>&1
fi
[ -f "$CKPT" ] || CKPT=$(ls -t $FT/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_md_ft_snr
if [ -n "$CKPT" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[chain3] grid eval fine-tuned ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
    $KNOBS > /tmp/grid_ft_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain3] ft corr', s.get('corr_macro_mean'), 'by_snr', \
[round(b['corr_mean'],3) for b in s.get('by_snr',[])])" | tee -a $LOG
fi

# ---- 7. knob re-derivation (reduced: 24 coarse, 3 refine) ----
SW=runs/flagship/sweep_md_ep200
if [ ! -f "$SW/best_cmd.txt" ] && ! past_deadline; then
  echo "[chain3] gw-sweep knob re-derivation $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2400 $PY -m $PKG.cli.sweep --input-h5 $EVAL --model "$FINAL" \
    --outdir "$SW" --indices 0 5 12 24 --n-coarse 24 --topk 3 \
    --ladder lambda --val-samples 16 --seed 0 > /tmp/sweep_md.log 2>&1
  tail -3 /tmp/sweep_md.log | tee -a $LOG
fi

# ---- 8. spin sensitivity ----
SPIN=runs/flagship/spin_sensitivity_md_ep200.json
if [ ! -f "$SPIN" ] && ! past_deadline; then
  echo "[chain3] spin sensitivity $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY tools/spin_sensitivity.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$SPIN" 2>/tmp/spin_sens_md.log
fi
echo "[chain3] all done $(date -u +%H:%M:%S)" | tee -a $LOG
