#!/bin/bash
# Round-4 chain 5: glitch-robustness measurement on the model-domain
# flagship (tools/glitch_robustness.py — sine-Gaussian injection at
# matched-filter SNR 0/4/8/16, reconstruction quality + does the no-clean
# res_flatness diagnostic flag the contamination).
# Runs on CPU (keeps the TPU clear for training/chain3): ep100 first
# (early signal), then ep200 after chain3 finishes with the TPU.
set -u
cd /root/repo
PY=python
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5

while [ ! -f runs/flagship/grid_md_ep100/summary.json ]; do sleep 180; done
OUT=runs/flagship/glitch_md_ep100.json
if [ ! -f "$OUT" ]; then
  echo "[chain5] glitch robustness @ep100 (CPU) $(date -u +%H:%M:%S)"
  $PY tools/glitch_robustness.py --input-h5 $EVAL \
    --model $MD/model_diffusion_ep100.msgpack \
    --steps 50 --avg-seeds 4 --device cpu > "$OUT" 2>/tmp/glitch_ep100.log \
    || echo "[chain5] ep100 glitch FAILED"
fi

while ! grep -q "all done" /tmp/chain3.log 2>/dev/null; do sleep 300; done
FINAL=$MD/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$(ls -t $MD/model_diffusion_ep*.msgpack | head -1)
OUT=runs/flagship/glitch_md_ep200.json
if [ ! -f "$OUT" ]; then
  echo "[chain5] glitch robustness @ep200 (TPU free now) $(date -u +%H:%M:%S)"
  $PY tools/glitch_robustness.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$OUT" 2>/tmp/glitch_ep200.log \
    || echo "[chain5] ep200 glitch FAILED"
fi
echo "[chain5] all done $(date -u +%H:%M:%S)"
