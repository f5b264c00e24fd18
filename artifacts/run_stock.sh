#!/bin/bash
cd /root/repo
BASE=/root/repo/artifacts
for SL in 0:5 5:10 10:15; do
  TAG=$(echo $SL | tr ':' '_')
  mkdir -p $BASE/campaign_stock/slice_$TAG
  cp $BASE/campaign_final/teach_state.ckpt $BASE/campaign_stock/slice_$TAG/
  for i in 1 2 3; do
    python -m nclt_slam_tpu.cli.campaign --routes all --mode stock \
      --out $BASE/campaign_stock/slice_$TAG --repeat-ticks 12000 \
      --phase repeat --route-slice $SL >> $BASE/campaign_stock.log 2>&1 && break
    echo "[retry] stock slice $SL attempt $i failed" >> $BASE/campaign_stock.log
  done
done
echo "[stock] done" >> $BASE/campaign_stock.log
