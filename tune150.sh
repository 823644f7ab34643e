#!/bin/bash
# Round-12 VERDICT #3 closing runs: the 150M-row throughput point, default
# config vs the shortlisted RocksDB config, appended to the official
# STREAM_THROUGHPUT.json curve. Raw generated once under /tmp/st150/d0.
# Usage: tune150.sh "<extra-conf-for-best-run>"
set -e
cd /root/repo
BEST_CONF="$1"
OUT=/root/repo/STREAM_THROUGHPUT.json

run() { # name extraConf
  local name=$1 conf=$2
  echo "=== $name conf=$conf $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/st150/$name"
  local envs=(SPARK_GRAFT_SHUFFLE_PARTITIONS=512 SPARK_DRIVER_MEM=64g SPARK_GRAFT_STREAM_OUT=$OUT)
  [ -n "$conf" ] && envs+=(SPARK_GRAFT_EXTRA_CONF="$conf")
  [ "$name" != d0 ] && envs+=(SPARK_GRAFT_STREAM_RAW=/tmp/st150/d0/raw)
  env "${envs[@]}" sbt -batch "runMain graft.tools.StreamThroughput /tmp/st150/$name 100 2000000" > "/tmp/st150/$name.log" 2>&1 \
    || echo "RUN $name FAILED (see /tmp/st150/$name.log)"
  tail -c 450 "$OUT"
}

run_at() { # name shuffle extraConf
  local name=$1 shuf=$2 conf=$3
  echo "=== $name shuffle=$shuf conf=$conf $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/st150/$name"
  local envs=(SPARK_GRAFT_SHUFFLE_PARTITIONS=$shuf SPARK_DRIVER_MEM=64g SPARK_GRAFT_STREAM_OUT=$OUT)
  [ -n "$conf" ] && envs+=(SPARK_GRAFT_EXTRA_CONF="$conf")
  [ "$name" != d0 ] && envs+=(SPARK_GRAFT_STREAM_RAW=/tmp/st150/d0/raw)
  env "${envs[@]}" sbt -batch "runMain graft.tools.StreamThroughput /tmp/st150/$name 100 2000000" > "/tmp/st150/$name.log" 2>&1 \
    || echo "RUN $name FAILED (see /tmp/st150/$name.log)"
  tail -c 450 "$OUT"
}

CL="spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
TR="spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false"
BM="spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true;spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB=49152;spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB=256"

mkdir -p /tmp/st150
run_at d0 512 ""          # clean baseline WITH the gold replay-admission fix
run_at d1 128 "$CL;$TR"   # 36M shortlist winner
run_at d2 128 "$CL;$TR;$BM"
echo "150M DONE"
