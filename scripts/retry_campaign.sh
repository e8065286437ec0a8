#!/bin/bash
# Round-17 targeted retry: wait for a quiet window, re-time the 4 steal-dirty
# queries from the baked ONLY run; then (next window) the planes re-anchor at
# BAKE_SEC=360 per the c858ada ledger. Run from /root/repo.
QUIET=${QUIET:-0.7}
LOG=target/retry_campaign.log
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
wait_quiet() {
  while true; do
    if w=$(quiet_window); then echo "[retry] $(date +%T) window open ($w)" | tee -a "$LOG"; break
    else echo "[retry] $(date +%T) busy ($w), waiting 60s" | tee -a "$LOG"; sleep 60; fi
  done
}
if [ ! -f target/retry4.done ]; then
  wait_quiet
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="corpus_split_safe,dedup_groups_capped,dedup_incremental_groups,dedup_ngram_jaccard_capped" \
    sbt -batch "runMain graft.Bench" >> "$LOG" 2>&1
  cp target/bench_shard_only.json target/bench_retry4.json
  touch target/retry4.done
  echo "[retry] retry4 record at target/bench_retry4.json" | tee -a "$LOG"
fi
wait_quiet
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="q_rollup" SPARK_GRAFT_BENCH_PLANES=1 \
  SPARK_GRAFT_BENCH_BAKE_SEC=360 \
  sbt -batch "runMain graft.Bench" >> "$LOG" 2>&1
cp target/bench_shard_only.json target/bench_planes.json
echo "[retry] planes record at target/bench_planes.json" | tee -a "$LOG"
