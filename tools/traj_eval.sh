#!/bin/bash
# Trajectory grid evals on periodic checkpoints as they appear (ep100,
# ep150): extends the RESULTS.md quality-vs-epoch table on the QNM corpus
# and catches training regressions hours before ep200.  Concurrent with
# training through the tunnel (known-safe, ~2x slower each).
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
MODEL_DIR=runs/big/model_pn128_130k/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
KNOBS="--steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999"

for EP in 100 150; do
  CKPT=$MODEL_DIR/model_diffusion_ep${EP}.msgpack
  OUT=runs/flagship/grid_pn128_130k_ep${EP}
  while [ ! -f "$CKPT" ]; do sleep 120; done
  sleep 30
  if [ ! -f "$OUT/summary.json" ]; then
    echo "[traj] grid eval ep${EP} $(date -u +%H:%M:%S)"
    python -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
      $KNOBS > /tmp/grid_ep${EP}.log 2>&1
    echo "[traj] ep${EP} done rc=$? $(date -u +%H:%M:%S)"
    python -c "import json; s=json.load(open('$OUT/summary.json')); print('[traj] ep${EP}', s.get('corr_macro_mean'), s.get('by_snr'))"
  fi
done
echo "[traj] all done"
