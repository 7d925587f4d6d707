#!/bin/bash
# Knob matrix at ep200, queued behind round3_chain.sh: seed-count and
# seed-aggregate levers on the final flagship checkpoint.
set -u
cd /root/repo
PY=python
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu
CKPT=runs/big/model_pn128_130k/latest_model/model_diffusion_ep200.msgpack
EVAL=runs/flagship/evalgrid_pn.h5

while ! grep -q "all done" /tmp/chain.log 2>/dev/null; do sleep 60; done

run () {  # run <outdir-suffix> <extra knobs...>
  local OUT=runs/flagship/grid_pn128_130k_ep200_$1; shift
  if [ -f "$CKPT" ] && [ ! -f "$OUT/summary.json" ]; then
    echo "[chain2] $OUT"
    $PY -m $PKG.cli.grid --input-h5 $EVAL --model $CKPT --outdir $OUT \
      --steps 50 --ladder lambda --amp-calib mf --start-t 999 "$@" \
      > /tmp/$(basename $OUT).log 2>&1
  fi
}

run avg16 --avg-seeds 16
run avg8med --avg-seeds 8 --avg-mode median
echo "[chain2] all done $(date -u +%H:%M:%S)"
