#!/bin/bash
# Round-3 chain 4 (after chain3): serving-latency benchmark of the final
# flagship artifact on the real TPU (fetch-forced, tools/bench_serving.py).
# Falls back to the ep25 artifact if chain3's export did not land.
set -u
cd /root/repo

while ! grep -q "\[chain3\] all done" /tmp/chain3.log 2>/dev/null; do
  sleep 120
done
echo "[chain4] chain3 done $(date -u +%H:%M:%S)"

ART=runs/flagship/serve/flagship_ep200.stablehlo
[ -f "$ART" ] || ART=runs/flagship/serve/sampler_pn128.shlo
OUT=runs/flagship/serve/bench_serving.json
if [ -f "$ART" ] && [ ! -f "$OUT" ]; then
  echo "[chain4] bench_serving on $ART $(date -u +%H:%M:%S)"
  timeout 1800 python tools/bench_serving.py --artifact "$ART" --reps 5 \
    > "$OUT" 2>/tmp/bench_serving.log && cat "$OUT"
fi
echo "[chain4] all done $(date -u +%H:%M:%S)"
