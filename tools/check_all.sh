#!/bin/bash
# Resumable full-surface gate: one isolated check_one.py process per
# query, status recorded to $OUT/gate_status.txt; already-[OK] queries
# skip on re-run. Usage: tools/check_all.sh <outDir> <sfDir>
OUT=${1:-/tmp/verify_out}
SF=${2:-/root/testdata/sf0.01}
STATUS="$OUT/gate_status.txt"
touch "$STATUS"
mkdir -p /tmp/duckdb_spill
for name in $(python3 -c "import json;print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  if grep -q "^\[OK\] $name " "$STATUS"; then continue; fi
  line=$(timeout 3600 python3 tools/check_one.py "$name" "$OUT" "$SF" 2>&1 | tail -1)
  [ -z "$line" ] && line="[CRASH] $name: process died"
  # drop any stale non-OK record for this query, then append
  grep -v "] $name[:(]" "$STATUS" > "$STATUS.tmp"; mv "$STATUS.tmp" "$STATUS"
  echo "$line" >> "$STATUS"
  echo "$line"
done
echo "---"
grep -c '^\[OK\]' "$STATUS"
