#!/bin/bash
# Waits for the flagship retrain to launch (round4_recover.sh writes
# /tmp/train_md200.pid), then starts the round-4 chains:
#   chain2 — ep25/ep100 trajectory grids (concurrent with training)
#   chain3 — post-training endgame (ep200 grid, sweep, distill, soup,
#            low-SNR ft, serving export + production-shape bench, spin)
#   chain4 — 16 kHz data + training + grid (waits for TPU itself)
set -u
cd /root/repo
while [ ! -f /tmp/train_md200.pid ]; do sleep 60; done
# give training a head start so its first compile isn't contended
sleep 300
echo "[launcher] training live, starting chains $(date -u +%H:%M:%S)"
nohup bash tools/round4_chain2.sh > /tmp/chain2.log 2>&1 &
nohup bash tools/round4_chain3.sh > /tmp/chain3.log 2>&1 &
# chain4's 16 kHz data gen is CPU-heavy: wait for the 155k merge to finish
# (round4_recover.sh sentinel) before taking the core.
while ! grep -q "all done" /tmp/r4sup.log 2>/dev/null && \
      ! grep -q "155k ready" /tmp/r4sup.log 2>/dev/null; do sleep 120; done
nohup bash tools/round4_chain4.sh > /tmp/chain4.log 2>&1 &
echo "[launcher] all chains launched $(date -u +%H:%M:%S)"
