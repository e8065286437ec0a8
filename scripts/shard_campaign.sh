#!/bin/bash
# Canonical-baseline shard campaign: scout quiet host windows with a cheap
# shell spin-probe (no JVM start), fire one bench shard per window, retry
# refused shards on later windows. Run from /root/repo.
#   N=10 ROUNDS=4 QUIET=0.7 bash scripts/shard_campaign.sh
N=${N:-10}
ROUNDS=${ROUNDS:-4}
QUIET=${QUIET:-0.7}   # max steal % per 5s probe, two consecutive required
LOG=${LOG:-target/shard_campaign.log}
mkdir -p target

probe() { # 5s 32-way spin; prints steal % of requested capacity
  local s0 s1
  s0=$(awk 'NR==1{print $9}' /proc/stat)
  for j in $(seq 32); do timeout 5 bash -c 'while :; do :; done' & done
  wait
  s1=$(awk 'NR==1{print $9}' /proc/stat)
  python3 -c "print(f'{($s1-$s0)/100/(5*32)*100:.2f}')"
}

quiet_window() { # two consecutive quiet probes
  local p1 p2
  p1=$(probe)
  python3 -c "import sys; sys.exit(0 if $p1 <= $QUIET else 1)" || { echo "$p1"; return 1; }
  p2=$(probe)
  python3 -c "import sys; sys.exit(0 if $p2 <= $QUIET else 1)" || { echo "$p1,$p2"; return 1; }
  echo "$p1,$p2"; return 0
}

promotable() {
  python3 -c "import json,sys; sys.exit(0 if json.load(open('$1')).get('shard_promotable') else 1)" 2>/dev/null
}

for round in $(seq 1 "$ROUNDS"); do
  left=0
  for i in $(seq 1 "$N"); do
    f=target/bench_shard_${i}_of_${N}.json
    if promotable "$f"; then continue; fi
    left=$((left+1))
    while true; do
      if w=$(quiet_window); then
        echo "[campaign] $(date +%T) round $round shard $i/$N launching (probes: $w)" | tee -a "$LOG"
        break
      else
        echo "[campaign] $(date +%T) busy ($w), waiting 40s" | tee -a "$LOG"
        sleep 40
      fi
    done
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_SHARD=$i/$N sbt -batch "runMain graft.Bench" \
      >>"$LOG" 2>&1
    python3 - <<PYEOF | tee -a "$LOG"
import json
try:
    d = json.load(open("$f"))
    print(f"[campaign] shard $i/$N promotable={d['shard_promotable']} "
          f"steal_sec={d['steal_sec']} shifted={d['machine_shifted']} "
          f"spread_clean={d['spread_clean']} quiet={d['probes_quiet']} "
          f"dirty1p={d['steal_dirty_first_pass']} "
          f"stealdirty={d['spread_steal_dirty']} "
          f"unrep={d['spread_unreproduced']} acc={d['spread_accepted_regressions']}")
except Exception as e:
    print(f"[campaign] shard $i/$N: no/bad record: {e}")
PYEOF
  done
  if [ "$left" = 0 ]; then echo "[campaign] all $N shards promotable" | tee -a "$LOG"; break; fi
done
echo "[campaign] done" | tee -a "$LOG"
