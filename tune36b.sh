#!/bin/bash
# Second pass: decouple state-partition count from RocksDB knobs, and
# repeat the two single-run outliers (single samples carry ±20% noise;
# min-of-two is the repo's bench discipline).
set -e
cd /root/repo
OUT=/root/repo/STREAM_TUNE_36M.json
CL="spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
TR="spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false"

run() { # name shuffle extraConf
  local name=$1 shuf=$2 conf=$3
  echo "=== $name shuffle=$shuf conf=$conf $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/st36/$name"
  local envs=(SPARK_GRAFT_SHUFFLE_PARTITIONS=$shuf SPARK_DRIVER_MEM=64g SPARK_GRAFT_STREAM_OUT=$OUT SPARK_GRAFT_STREAM_RAW=/tmp/st36/c0/raw)
  [ -n "$conf" ] && envs+=(SPARK_GRAFT_EXTRA_CONF="$conf")
  env "${envs[@]}" sbt -batch "runMain graft.tools.StreamThroughput /tmp/st36/$name 100 480000" > "/tmp/st36/$name.log" 2>&1 \
    || echo "RUN $name FAILED (see /tmp/st36/$name.log)"
  tail -c 400 "$OUT"
}

run c6 128 ""          # 128 partitions, stock store config
run c1r 512 "$CL"      # repeat: changelog alone (first sample looked 2x slow)
run c4r 128 "$CL;$TR"  # repeat: the shortlist winner
echo "SWEEP B DONE"
