#!/bin/bash
# Round-3 chain 3 (runs after tools/round3_chain2.sh finishes):
# low-SNR-enriched fine-tune of the ep200 flagship, targeting the measured
# dominant error mode (RESULTS.md "Error anatomy": residual corr deficit is
# concentrated in the SNR<18 tercile; corr vs injected SNR r~0.7).  Same
# move that fixed the low-mass deficit in round 3 (30k low-mass top-up):
# 25k extra samples drawn from the SAME physics/domain but SNR U[10,18],
# merged into the 130k corpus, then a short low-LR fine-tune from ep200.
# Also exports the final flagship's deployment sampler as a serving
# artifact (gw-export) once the fine-tune comparison is queued.
# Idempotent; each block skips if its artifact exists.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MODEL_DIR=runs/big/model_pn128_130k/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

# --- data prep: CPU-only, can run before the TPU frees up ----------------
if [ ! -f runs/big/train_pn155k.h5 ]; then
  if [ ! -f runs/big/train_pnsnr25k.h5 ]; then
    echo "[chain3] generating 25k low-SNR top-up $(date -u +%H:%M:%S)"
    $PY -m $PKG.cli.gen --mode random --num-samples 25000 \
      --output-path runs/big/train_pnsnr25k.h5 \
      --mass1-min 20 --mass1-max 50 --mass2-min 20 --mass2-max 50 \
      --spin1-min -0.8 --spin1-max 0.8 --spin2-min -0.8 --spin2-max 0.8 \
      --snr-min 10 --snr-max 18 --progress-every 10000 --seed 2 \
      > /tmp/gen_snr25k.log 2>&1 || exit 1
  fi
  echo "[chain3] merging -> train_pn155k.h5 $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.merge runs/big/train_pn130k.h5 runs/big/train_pnsnr25k.h5 \
    --output-path runs/big/train_pn155k.h5 > /tmp/merge155k.log 2>&1 || exit 1
  rm -f runs/big/train_pnsnr25k.h5
fi

# --- wait for chain1 (not chain2): the fine-tune's first ~20 min is pure
# CPU dataset prep (AOT f64 whitening of 155k), which overlaps chain2's
# TPU work (soup grid + spin sensitivity) for free; the ft's TPU phase
# starts as chain2 winds down (brief concurrency through the tunnel is
# known-safe, ~2x each). Saves the serial prep window vs waiting on chain2.
while ! grep -q "\[chain\] all done" /tmp/chain.log 2>/dev/null; do
  sleep 120
done
echo "[chain3] chain1 done, starting ft prep $(date -u +%H:%M:%S)"

FINAL=$MODEL_DIR/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$MODEL_DIR/model_diffusion.msgpack

FT=runs/big/model_pn128_ft_snr
if [ ! -f $FT/latest_model/model_diffusion.msgpack ]; then
  echo "[chain3] fine-tune from $FINAL on 155k $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.train --data runs/big/train_pn155k.h5 \
    --model_dir $FT --epochs 10 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 --lr 5e-5 \
    --init-from "$FINAL" --save-every-epochs 10 \
    > /tmp/train_ft.log 2>&1
fi

OUT=runs/flagship/grid_pn128_ft_snr
CKPT=$FT/latest_model/model_diffusion.msgpack
if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[chain3] grid eval fine-tuned $(date -u +%H:%M:%S)"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
    $KNOBS > /tmp/grid_ft.log 2>&1
  $PY -c "import json; s=json.load(open('$OUT/summary.json')); print('[chain3] ft', s.get('corr_macro_mean'), s.get('by_snr'))"
fi

# --- deployment artifact for the real flagship (CPU process, quick) ------
SERVE=runs/flagship/serve/flagship_ep200.stablehlo
if [ ! -f "$SERVE" ]; then
  echo "[chain3] exporting flagship serving artifact $(date -u +%H:%M:%S)"
  # no --validate: replaying the full recipe (50 steps x avg8 x batch 64)
  # on this box's single CPU core takes tens of minutes; the export/replay
  # mechanism itself is covered by tests/test_serving.py on a small model
  $PY -m $PKG.cli.export --model "$FINAL" --output "$SERVE" \
    --batch-size 64 --length 4096 --platforms tpu,cpu \
    --steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf \
    > /tmp/export_flagship.log 2>&1 \
    && tail -2 /tmp/export_flagship.log
fi
echo "[chain3] all done $(date -u +%H:%M:%S)"
