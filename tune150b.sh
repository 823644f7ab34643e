#!/bin/bash
# 150M-row closing runs, take 2: all three configs reuse the preserved raw
# corpus at /tmp/st150/raw0, and each run's workdir is deleted after its
# JSON line lands (a 150M medallion materializes ~30G; three would not fit).
set -e
cd /root/repo
OUT=/root/repo/STREAM_THROUGHPUT.json
CL="spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
TR="spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false"
BM="spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true;spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB=49152;spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB=256"

run() { # name shuffle extraConf
  local name=$1 shuf=$2 conf=$3
  echo "=== $name shuffle=$shuf conf=$conf $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/st150/$name"
  local envs=(SPARK_GRAFT_SHUFFLE_PARTITIONS=$shuf SPARK_DRIVER_MEM=64g
              SPARK_GRAFT_STREAM_OUT=$OUT SPARK_GRAFT_STREAM_RAW=/tmp/st150/raw0)
  [ -n "$conf" ] && envs+=(SPARK_GRAFT_EXTRA_CONF="$conf")
  env "${envs[@]}" sbt -batch "runMain graft.tools.StreamThroughput /tmp/st150/$name 100 2000000" > "/tmp/st150/$name.log" 2>&1 \
    || echo "RUN $name FAILED (see /tmp/st150/$name.log)"
  tail -c 500 "$OUT"
  rm -rf "/tmp/st150/$name"
  df -h / | tail -1
}

run e0 512 ""          # clean baseline WITH the gold replay-admission fix
run e1 128 "$CL;$TR"   # 36M shortlist winner
run e2 128 "$CL;$TR;$BM"
echo "150M TAKE2 DONE"
