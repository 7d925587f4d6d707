#!/bin/bash
# Early-signal grid eval on the first periodic checkpoint (ep25) of the
# round-3 flagship train.  Purpose: validate the full eval pipeline
# (QNM evalgrid, checkpoint-domain inheritance, deployment knobs) hours
# before ep200 lands, so a recipe/domain bug costs 1h not 7h.
# Runs concurrently with training through the tunnel (~2x slower each,
# known-safe pattern, CLAUDE.md round-2 notes).
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
CKPT=runs/big/model_pn128_130k/latest_model/model_diffusion_ep25.msgpack
EVAL=runs/flagship/evalgrid_pn.h5
OUT=runs/flagship/grid_pn128_130k_ep25

while [ ! -f "$CKPT" ]; do sleep 60; done
sleep 30   # let the save finish
echo "[early] ep25 checkpoint present $(date -u +%H:%M:%S)"
python -m $PKG.cli.grid --input-h5 $EVAL --model "$CKPT" --outdir "$OUT" \
  --steps 50 --ladder lambda --avg-seeds 8 --amp-calib mf --start-t 999 \
  > /tmp/grid_ep25.log 2>&1
echo "[early] grid eval exit $? $(date -u +%H:%M:%S)"
python - <<'EOF'
import json
s = json.load(open('runs/flagship/grid_pn128_130k_ep25/summary.json'))
print('[early] ep25 corr_macro', s.get('corr_macro_mean'), 'mf', s.get('mf_ratio_macro_mean'), 'by_snr', s.get('by_snr'))
EOF
