#!/bin/bash
OUT=/root/repo/artifacts/campaign_final
LOG=$OUT.slices.log
cd /root/repo
for SL in 0:5 5:10 10:15; do
  TAG=$(echo $SL | tr ':' '_')
  mkdir -p $OUT/slice_$TAG
  cp $OUT/teach_state.ckpt $OUT/slice_$TAG/
  for i in 1 2 3; do
    python -m nclt_slam_tpu.cli.campaign --routes all --mode ours \
      --out $OUT/slice_$TAG --repeat-ticks 12000 --phase repeat \
      --route-slice $SL >> $LOG 2>&1 && break
    echo "[retry] slice $SL attempt $i failed" >> $LOG
  done
done
echo "[slices] all done" >> $LOG
