#!/bin/bash
# Round-12 silver-plateau shortlist: RocksDB state-store configs at the
# ~36M-row point (VERDICT #3). Raw CSV generated once (c0), reused by
# every later config via SPARK_GRAFT_STREAM_RAW. No pipes on the sbt
# output (a closed pipe SIGPIPE-kills the JVM mid-run) — full logs per
# config under /tmp/st36/<name>.log.
set -e
cd /root/repo
OUT=/root/repo/STREAM_TUNE_36M.json
CL="spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
TR="spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows=false"
BM="spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true;spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB=49152;spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB=256"

run() { # name shuffle extraConf
  local name=$1 shuf=$2 conf=$3
  echo "=== $name shuffle=$shuf conf=$conf $(date -u +%H:%M:%S) ==="
  rm -rf "/tmp/st36/$name"
  local envs=(SPARK_GRAFT_SHUFFLE_PARTITIONS=$shuf SPARK_DRIVER_MEM=64g SPARK_GRAFT_STREAM_OUT=$OUT)
  [ -n "$conf" ] && envs+=(SPARK_GRAFT_EXTRA_CONF="$conf")
  [ "$name" != c0 ] && envs+=(SPARK_GRAFT_STREAM_RAW=/tmp/st36/c0/raw)
  env "${envs[@]}" sbt -batch "runMain graft.tools.StreamThroughput /tmp/st36/$name 100 480000" > "/tmp/st36/$name.log" 2>&1 \
    || echo "RUN $name FAILED (see /tmp/st36/$name.log)"
  tail -c 400 "$OUT"
}

run c1 512 "$CL"
run c2 512 "$TR"
run c3 512 "$CL;$TR"
run c4 128 "$CL;$TR"
run c5 512 "$CL;$TR;$BM"
run c0b 512 ""
echo "SWEEP DONE"
