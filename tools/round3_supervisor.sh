#!/bin/bash
# Round-3 unattended pipeline after the third VM rebuild:
# wait for data regen -> launch flagship training (TPU) -> post-training chain.
set -u
cd /root/repo
PKG=diffusion_models_for_gravitational_waveform_reconstruction_tpu

# Wait for regen to finish (merge included) — file existence is not enough,
# the merge writes in place, so gate on the log sentinel.
while ! grep -q "ALL DONE" /tmp/regen.log 2>/dev/null; do sleep 60; done
echo "[sup] data ready $(date -u +%H:%M:%S)"

if [ ! -f runs/big/model_pn128_130k/latest_model/model_diffusion.msgpack ]; then
  nohup python -m $PKG.cli.train \
    --data runs/big/train_pn130k.h5 \
    --model_dir runs/big/model_pn128_130k \
    --epochs 200 --batch-size 64 --base_ch 128 --pred_type v \
    --whiten 1 --whiten_mode model --t_min_frac 0 \
    --save-every-epochs 25 \
    > /tmp/train_flagship.log 2>&1 &
  echo $! > /tmp/train_resume.pid
  echo "[sup] training launched pid $(cat /tmp/train_resume.pid) $(date -u +%H:%M:%S)"
fi

bash tools/round3_chain.sh > /tmp/chain.log 2>&1
echo "[sup] chain done $(date -u +%H:%M:%S)"
