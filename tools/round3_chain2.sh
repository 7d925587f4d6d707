#!/bin/bash
# Round-3 post-chain extras (runs after tools/round3_chain.sh finishes):
# 1. late-epoch checkpoint soup (ep150+ep175+ep200) + grid eval — the one
#    cheap quality lever not yet measured on this flagship (ensembling was
#    neutral; soup averages WEIGHTS, single-model inference cost)
# 2. spin-conditioning sensitivity on the final flagship (VERDICT r2 #1
#    'done' criterion re-checked on the QNM-era model)
# Idempotent; each block skips if its artifact exists.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MODEL_DIR=runs/big/model_pn128_130k/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

# wait for the primary chain to finish (sentinel written by round3_chain.sh)
while ! grep -q "all done" /tmp/chain.log 2>/dev/null; do sleep 120; done
echo "[chain2] primary chain done $(date -u +%H:%M:%S)"

SOUP=runs/big/model_pn128_130k/soup_ep150_200.msgpack
if [ ! -f "$SOUP" ] && [ -f $MODEL_DIR/model_diffusion_ep150.msgpack ] \
   && [ -f $MODEL_DIR/model_diffusion_ep175.msgpack ]; then
  FINAL=$MODEL_DIR/model_diffusion_ep200.msgpack
  [ -f "$FINAL" ] || FINAL=$MODEL_DIR/model_diffusion.msgpack
  $PY -m $PKG.cli.soup --inputs \
    $MODEL_DIR/model_diffusion_ep150.msgpack \
    $MODEL_DIR/model_diffusion_ep175.msgpack \
    "$FINAL" --output "$SOUP" > /tmp/soup.log 2>&1
fi

OUT=runs/flagship/grid_pn128_130k_soup
if [ -f "$SOUP" ] && [ ! -f "$OUT/summary.json" ]; then
  echo "[chain2] grid eval soup"
  $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$SOUP" --outdir "$OUT" \
    $KNOBS > /tmp/grid_soup.log 2>&1
fi

SPIN=runs/flagship/spin_sensitivity_ep200.json
if [ ! -f "$SPIN" ]; then
  FINAL=$MODEL_DIR/model_diffusion_ep200.msgpack
  [ -f "$FINAL" ] || FINAL=$MODEL_DIR/model_diffusion.msgpack
  echo "[chain2] spin sensitivity"
  $PY tools/spin_sensitivity.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$SPIN" 2>/tmp/spin_sens.log
fi
echo "[chain2] all done $(date -u +%H:%M:%S)"
