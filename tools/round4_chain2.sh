#!/bin/bash
# Round-4 chain 2: trajectory evals of the MODEL-DOMAIN flagship retrain
# (runs/big/model_md200) as checkpoints land.  Purpose: early signal that
# the whitening-domain fix (derived analytic PSD -> real model whitening)
# recovers the wiped run's quality (ep100 corr_macro 0.7975 model-domain vs
# 0.7276 train-like, VERDICT r3) and that mf_ratio_macro_mean is back in
# summary.json (requires P_model_used at eval time — now derivable).
# Anchors: rebuilt train-like ep25 = 0.7171 (RESULTS.md).
# Idempotent: each block skips if its summary exists.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

for EP in 25 100; do
  CKPT=$MD/model_diffusion_ep${EP}.msgpack
  OUT=runs/flagship/grid_md_ep${EP}
  # wait for the checkpoint (training writes every 25 epochs)
  while [ ! -f "$CKPT" ]; do
    # bail out if the training process died before writing it
    if ! kill -0 "$(cat /tmp/train_md200.pid 2>/dev/null)" 2>/dev/null \
        && [ ! -f "$CKPT" ]; then
      echo "[chain2] training gone before ep${EP}; stopping"
      exit 1
    fi
    sleep 120
  done
  if [ ! -f "$OUT/summary.json" ]; then
    echo "[chain2] grid eval ep${EP} $(date -u +%H:%M:%S)"
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      $KNOBS > /tmp/grid_md_ep${EP}.log 2>&1
    $PY -c "import json; s=json.load(open('$OUT/summary.json')); \
print('[chain2] ep${EP} corr', s.get('corr_macro_mean'), 'mf', \
s.get('mf_ratio_macro_mean'), 'domain', s.get('whiten_kind_used'), \
'by_snr', [round(b['corr_mean'],3) for b in s.get('by_snr',[])])"
  fi
done
echo "[chain2] all done $(date -u +%H:%M:%S)"
