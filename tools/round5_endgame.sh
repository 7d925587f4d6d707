#!/bin/bash
# Round-5 endgame v2 (replaces round5_chain{3,5}.sh): serialized, idempotent,
# deadline-guarded. Re-planned from measured costs this session (grids ~6 min,
# ft ~2 min/epoch, flagship loss plateaued 0.01116@ep100 -> 0.01097@ep134):
# the TPU-minute budget cannot fund training to ep200 AND the VERDICT r4
# items, so the flagship stops at ep175 (~nil quality cost at plateau) and
# the freed ~50 min funds the 16 kHz push (item 2), taper A/B (item 5) and
# knob sweep (item 4). Order = judge priority:
#   hbm roof (item 8) -> ep175 headline grid (1) -> distill grids (1)
#   -> soup (1) -> mf-avg A/B (1) -> low-SNR ft (1) -> serving bench (3)
#   -> taper A/B retrains (5) -> sweep (4) -> glitch@ep175 (7) -> spin.
# round5_16k.sh runs CONCURRENTLY (tunnel throughput is conserved 2-way).
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"
LOG=/tmp/endgame.log

DEADLINE=1787168700   # ~19:45 UTC: no NEW TPU job (driver bench ~20:16)
past_deadline() { [ "$(date -u +%s)" -ge "$DEADLINE" ]; }

# ---- 0. stop the flagship at ep175 (plateaued); free the chip ----
TRAIN_PID=$(cat /tmp/train_md200.pid 2>/dev/null || echo 0)
if [ "$TRAIN_PID" != 0 ] && kill -0 "$TRAIN_PID" 2>/dev/null; then
  while [ ! -f $MD/model_diffusion_ep175.msgpack ] \
        && kill -0 "$TRAIN_PID" 2>/dev/null && ! past_deadline; do
    sleep 30
  done
  sleep 45   # let the ep175 write settle
  kill "$TRAIN_PID" 2>/dev/null
  while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 5; done
fi
FINAL=$MD/model_diffusion_ep175.msgpack
[ -f "$FINAL" ] || FINAL=$(ls -t $MD/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
echo "[endgame] trainer stopped; flagship = $FINAL $(date -u +%H:%M:%S)" | tee -a $LOG

# ---- 1. HBM-stream roof on the idle chip (VERDICT item 8) ----
HBM=runs/flagship/hbm_stream_tpu.json
if [ ! -f "$HBM" ] && ! past_deadline; then
  timeout 600 $PY tools/bench_kernels.py hbm > "$HBM" 2>/tmp/hbm_bench.log \
    && tail -1 "$HBM" | tee -a $LOG
fi

# ---- 2. headline grid @ep175 ----
OUT=runs/flagship/grid_md_ep175
if [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[endgame] headline grid @ep175 $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" \
    --outdir "$OUT" $KNOBS > /tmp/grid_md_ep175.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] ep175 corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 3. progressive distillation (teacher @32-step lambda) + student grids.
# Data = the 20k legacy-taper corpus (same generator config as the flagship's
# 130k, minus the low-mass top-up): ~same optimization steps via 6 epochs,
# but 1.3 GB device-resident instead of 10.5 GB — the 16 kHz trainer shares
# the chip's 16 GB HBM concurrently. ----
DIST=runs/big/distilled_md
DDATA=runs/big/train_tap10_20k.h5
[ -f "$DDATA" ] || DDATA=runs/big/train_pn130k.h5
if [ ! -f "$DIST/model_distilled_4step.msgpack" ] && ! past_deadline; then
  echo "[endgame] distilling from $FINAL on $DDATA $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 2700 $PY -m $PKG.cli.distill --teacher "$FINAL" \
    --data $DDATA --model_dir $DIST \
    --steps-schedule 32,16,8,4 --epochs 6 --batch-size 64 \
    --ladder lambda --start-t 999 --log-jsonl $DIST/distill.jsonl \
    > /tmp/distill_md.log 2>&1
fi
for NS in 8 4; do
  CKPT=$DIST/model_distilled_${NS}step.msgpack
  OUT=runs/flagship/grid_md_distilled_${NS}step
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
    echo "[endgame] grid distilled ${NS}-step $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout 1500 $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" \
      --outdir "$OUT" --avg-seeds 8 --amp-calib mf \
      > /tmp/grid_md_distilled_${NS}.log 2>&1
    $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] distilled ${NS}-step corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
  fi
done

# ---- 4. late-epoch soup (ep125/150/175) + grid ----
SOUP=runs/big/model_md200/soup_ep125_175.msgpack
if [ ! -f "$SOUP" ] && [ -f $MD/model_diffusion_ep125.msgpack ] \
   && [ -f $MD/model_diffusion_ep150.msgpack ] && ! past_deadline; then
  timeout 600 $PY -m $PKG.cli.soup --inputs \
    $MD/model_diffusion_ep125.msgpack $MD/model_diffusion_ep150.msgpack \
    "$FINAL" --output "$SOUP" > /tmp/soup_md.log 2>&1
fi
OUT=runs/flagship/grid_md_soup
if [ -f "$SOUP" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[endgame] grid soup $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1500 $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$SOUP" \
    --outdir "$OUT" $KNOBS > /tmp/grid_md_soup.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] soup corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 5. seed-aggregation A/B (mf-weighted vs plain mean) ----
OUT=runs/flagship/grid_md_ep175_mfavg
if [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[endgame] grid avg-mode=mf $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1500 $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$FINAL" \
    --outdir "$OUT" $KNOBS --avg-mode mf > /tmp/grid_md_mfavg.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] mf-avg corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
fi

# ---- 7. serving export + fetch-forced production-shape bench ----
SERVE=runs/flagship/serve/flagship_md_ep175.shlo
if [ ! -f "$SERVE" ] && ! past_deadline; then
  echo "[endgame] serving export $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY -m $PKG.cli.export --model "$FINAL" --output "$SERVE" \
    --batch-size 64 --length 4096 --platforms tpu,cpu \
    --steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf \
    > /tmp/export_md.log 2>&1 && tail -2 /tmp/export_md.log | tee -a $LOG
fi
BS=runs/flagship/serve/bench_md_ep175.json
if [ -f "$SERVE" ] && [ ! -f "$BS" ] && ! past_deadline; then
  echo "[endgame] serving bench (production shape) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1800 $PY tools/bench_serving.py --artifact "$SERVE" --reps 3 \
    > "$BS" 2>/tmp/bench_serving_md.log && cat "$BS" | tee -a $LOG
fi

# ---- 8. taper/attachment A/B retrains (identical config, corpus differs:
# tap10 = legacy, tap085 = below-band taper, tapc1 = taper + C1 ringdown) ----
for TAG in 10 085 c1; do
  TR=runs/big/train_tap${TAG}_20k.h5
  EV=runs/flagship/evalgrid_tap${TAG}.h5
  M=runs/big/model_tap${TAG}
  CKPT=$M/latest_model/model_diffusion.msgpack
  if [ -f "$TR" ] && [ ! -f "$CKPT" ] && ! past_deadline; then
    echo "[endgame] taper A/B train tap$TAG $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout 1200 $PY -m $PKG.cli.train --data $TR --model_dir $M \
      --epochs 30 --batch-size 64 --base_ch 64 --pred_type v \
      --whiten 1 --whiten_mode model --t_min_frac 0 \
      --save-every-epochs 10 > /tmp/train_tap${TAG}.log 2>&1
  fi
  [ -f "$CKPT" ] || CKPT=$(ls -t $M/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
  OUT=runs/flagship/grid_tap${TAG}
  if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ -f "$EV" ] \
     && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
    echo "[endgame] taper A/B grid tap$TAG $(date -u +%H:%M:%S)" | tee -a $LOG
    timeout 1500 $PY -m $PKG.cli.grid --input-h5 $EV --model "$CKPT" \
      --outdir "$OUT" --steps 50 --ladder lambda --avg-seeds 4 \
      --amp-calib mf --start-t 999 > /tmp/grid_tap${TAG}.log 2>&1
    $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] tap$TAG corr', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'))" | tee -a $LOG
  fi
done

# ---- 9. reduced knob sweep on the model-domain flagship ----
SW=runs/flagship/sweep_md_ep175
if [ ! -f "$SW/best_cmd.txt" ] && ! past_deadline; then
  echo "[endgame] gw-sweep knob re-derivation $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1200 $PY -m $PKG.cli.sweep --input-h5 $EVAL --model "$FINAL" \
    --outdir "$SW" --indices 0 12 24 --n-coarse 16 --topk 3 \
    --ladder lambda --val-samples 12 --seed 0 > /tmp/sweep_md.log 2>&1
  tail -3 /tmp/sweep_md.log | tee -a $LOG
fi

# ---- 10. glitch robustness @ep175 (TPU, batched) ----
GL=runs/flagship/glitch_md_ep175.json
if [ ! -f "$GL" ] && ! past_deadline; then
  echo "[endgame] glitch robustness @ep175 $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1500 $PY tools/glitch_robustness.py --input-h5 $EVAL \
    --model "$FINAL" --steps 50 --avg-seeds 4 > "$GL" 2>/tmp/glitch_ep175.log \
    || echo "[endgame] glitch FAILED/timeout" | tee -a $LOG
fi

# ---- 11. spin sensitivity (lowest priority) ----
SPIN=runs/flagship/spin_sensitivity_md_ep175.json
if [ ! -f "$SPIN" ] && ! past_deadline; then
  echo "[endgame] spin sensitivity $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 900 $PY tools/spin_sensitivity.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$SPIN" 2>/tmp/spin_sens_md.log || true
fi

# ---- 12. low-SNR fine-tune on 155k + grid (by_snr is the target metric).
# LAST and gated on the 16 kHz job being done: the 155k dataset is ~12.5 GB
# device-resident and cannot share the 16 GB HBM with the 16 kHz trainer
# or its L=16384 grid eval. ----
while ! grep -q "all done" /tmp/16k.log 2>/dev/null && ! past_deadline; do
  sleep 60
done
FT=runs/big/model_md_ft_snr
CKPT=$FT/latest_model/model_diffusion.msgpack
if [ ! -f "$CKPT" ] && ! past_deadline; then
  echo "[endgame] low-SNR fine-tune on 155k $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1200 $PY -m $PKG.cli.train --data runs/big/train_pn155k.h5 \
    --model_dir $FT --epochs 4 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 --lr 5e-5 \
    --init-from "$FINAL" --save-every-epochs 1 > /tmp/train_ft_md.log 2>&1
fi
[ -f "$CKPT" ] || CKPT=$(ls -t $FT/latest_model/model_diffusion_ep*.msgpack 2>/dev/null | head -1)
OUT=runs/flagship/grid_md_ft_snr
if [ -n "${CKPT:-}" ] && [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ] && ! past_deadline; then
  echo "[endgame] grid fine-tuned ($CKPT) $(date -u +%H:%M:%S)" | tee -a $LOG
  timeout 1500 $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" \
    --outdir "$OUT" $KNOBS > /tmp/grid_ft_md.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[endgame] ft corr', s.get('corr_macro_mean'), 'by_snr', \
[round(b['corr_mean'],3) for b in s.get('by_snr',[])])" | tee -a $LOG
fi
echo "[endgame] all done $(date -u +%H:%M:%S)" | tee -a $LOG
