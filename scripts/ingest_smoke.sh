#!/usr/bin/env bash
# spark-submit smoke of the `watch --ingest-gate` CLI plane — the
# Dockerfile pattern (thin `sbt package` jar on the official Spark
# runtime), proving the packaged binary path end-to-end: two json doc
# files stream through the composed daily-ingest loop (near-dup gate →
# index probe → partitioned canonical-map fold) and the --once summary
# line must report the exact fixture counts (3 accepted docs — one
# near-dup rejected at the 0.8 gate — and a 2-row canonical map for the
# one group that forms at the 0.7 map threshold).
#
# Usage: scripts/ingest_smoke.sh   (builds the jar if missing)
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
JAR="$REPO/target/scala-2.13/cdcdedupespark_2.13-0.1.0.jar"
[ -f "$JAR" ] || sbt -batch package

WORK=$(mktemp -d /tmp/graft-ingest-smoke.XXXXXX)
trap 'rm -rf "$WORK"' EXIT
mkdir -p "$WORK/docs" "$WORK/run"

# fixture: 40-word docs; 2 edited words = jaccard 0.727 (accepted at the
# 0.8 gate, grouped at the 0.7 map threshold), 1 edited word = 0.854
# (gate-rejected). Same family as the ingest specs.
mkw() { local tag=$1 out="" i; for i in $(seq 1 40); do out+="$tag$i "; done; echo "${out% }"; }
edit() { # edit <tag> <pos...>: word at each pos replaced with editedPOS
  local tag=$1; shift; local -a w=(); local i
  for i in $(seq 1 40); do w+=("$tag$i"); done
  for i in "$@"; do w[$i]="edited$i"; done
  echo "${w[*]}"
}
printf '{"doc_id":1,"text":"%s"}\n{"doc_id":2,"text":"%s"}\n' \
  "$(mkw alpha)" "$(mkw beta)" > "$WORK/docs/e1.json"
sleep 1.1   # distinct mtimes: the file source orders epochs by mtime
printf '{"doc_id":11,"text":"%s"}\n{"doc_id":13,"text":"%s"}\n' \
  "$(edit alpha 10 25)" "$(edit alpha 19)" > "$WORK/docs/e2.json"

# run from $WORK so the derby metastore + warehouse stay in the sandbox
(cd "$WORK/run" && /opt/spark/bin/spark-submit \
  --class graft.Main --master 'local[4]' \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  "$JAR" watch --ingest-gate \
  --in "$WORK/docs" --checkpoint "$WORK/ckpt" \
  --corpus-table smoke_corpus --index-table smoke_idx \
  --map-table smoke_map --nbuckets 2 --npartitions 4 \
  --max-files-per-trigger 1 --once) 2>"$WORK/stderr.log" \
  | tee "$WORK/out.log"

grep -q '^ingest-gate: corpus=3 docs, map=2 rows$' "$WORK/out.log" || {
  echo "SMOKE FAILED: expected 'ingest-gate: corpus=3 docs, map=2 rows'" >&2
  tail -30 "$WORK/stderr.log" >&2
  exit 1
}
echo "SMOKE OK: packaged watch --ingest-gate plane verified"
