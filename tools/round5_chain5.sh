#!/bin/bash
# Round-5 chain 5: glitch robustness @ep200 — deadline-guarded so the TPU is
# free for the driver's round-end bench. The @ep100 CPU run (round4_chain5)
# is left running; this script only handles the ep200 stage.
set -u
cd /root/repo
PY=python
MD=runs/big/model_md200/latest_model
EVAL=runs/flagship/evalgrid_pn.h5
DEADLINE=1787168400   # ~19:40 UTC

while ! grep -q "all done" /tmp/chain3.log 2>/dev/null; do
  [ "$(date -u +%s)" -ge "$DEADLINE" ] && { echo "[chain5r5] deadline, skip ep200 glitch"; exit 0; }
  sleep 180
done
FINAL=$MD/model_diffusion_ep200.msgpack
[ -f "$FINAL" ] || FINAL=$(ls -t $MD/model_diffusion_ep*.msgpack | head -1)
OUT=runs/flagship/glitch_md_ep200.json
if [ ! -f "$OUT" ] && [ "$(date -u +%s)" -lt "$DEADLINE" ]; then
  echo "[chain5r5] glitch robustness @ep200 $(date -u +%H:%M:%S)" | tee -a /tmp/chain5.log
  timeout 1500 $PY tools/glitch_robustness.py --input-h5 $EVAL --model "$FINAL" \
    --steps 50 --avg-seeds 4 > "$OUT" 2>/tmp/glitch_ep200.log \
    || echo "[chain5r5] ep200 glitch FAILED/timeout" | tee -a /tmp/chain5.log
fi
echo "[chain5r5] all done $(date -u +%H:%M:%S)" | tee -a /tmp/chain5.log
