#!/bin/bash
# Round-17 optimization measurement wave: wait for a quiet host window
# (the retry_campaign.sh spin-probe gate), then re-time a named query set
# with the baked BENCH_ONLY methodology (150 s default bake in ONLY mode).
# Usage: QUERIES="a,b,c" OUT=target/bench_r17_wave1.json scripts/r17_measure.sh
QUIET=${QUIET:-0.7}
LOG=${LOG:-target/r17_measure.log}
OUT=${OUT:-target/bench_r17_wave.json}
mkdir -p target
probe() {
  local s0 s1
  s0=$(awk 'NR==1{print $9}' /proc/stat)
  for j in $(seq 32); do timeout 5 bash -c 'while :; do :; done' & done
  wait
  s1=$(awk 'NR==1{print $9}' /proc/stat)
  python3 -c "print(f'{($s1-$s0)/100/(5*32)*100:.2f}')"
}
quiet_window() {
  local p1 p2
  p1=$(probe)
  python3 -c "import sys; sys.exit(0 if $p1 <= $QUIET else 1)" || { echo "$p1"; return 1; }
  p2=$(probe)
  python3 -c "import sys; sys.exit(0 if $p2 <= $QUIET else 1)" || { echo "$p1,$p2"; return 1; }
  echo "$p1,$p2"; return 0
}
while true; do
  if w=$(quiet_window); then echo "[r17] $(date +%T) window open ($w)" | tee -a "$LOG"; break
  else echo "[r17] $(date +%T) busy ($w), waiting 60s" | tee -a "$LOG"; sleep 60; fi
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  sbt -batch "runMain graft.Bench" >> "$LOG" 2>&1
cp target/bench_shard_only.json "$OUT"
echo "[r17] record at $OUT" | tee -a "$LOG"
