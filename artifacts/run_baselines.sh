#!/bin/bash
cd /root/repo
BASE=/root/repo/artifacts
# encoder-only: light program, run full-width
mkdir -p $BASE/campaign_encoder
cp $BASE/campaign_final/teach_state.ckpt $BASE/campaign_encoder/
python -m nclt_slam_tpu.cli.campaign --routes all --mode encoder \
  --out $BASE/campaign_encoder --repeat-ticks 12000 --phase repeat \
  >> $BASE/campaign_encoder.log 2>&1
# rgbd: slice like ours
for SL in 0:5 5:10 10:15; do
  TAG=$(echo $SL | tr ':' '_')
  mkdir -p $BASE/campaign_rgbd/slice_$TAG
  cp $BASE/campaign_final/teach_state.ckpt $BASE/campaign_rgbd/slice_$TAG/
  for i in 1 2 3; do
    python -m nclt_slam_tpu.cli.campaign --routes all --mode rgbd \
      --out $BASE/campaign_rgbd/slice_$TAG --repeat-ticks 12000 \
      --phase repeat --route-slice $SL >> $BASE/campaign_rgbd.log 2>&1 && break
    echo "[retry] rgbd slice $SL attempt $i failed" >> $BASE/campaign_rgbd.log
  done
done
echo "[baselines] done" >> $BASE/campaign_rgbd.log
