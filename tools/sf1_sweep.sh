#!/bin/bash
# Round-18 sf1 oracle sweep: compare the remaining dumps under tmp/verify_sf1
# against the DuckDB oracles, one subprocess per query so `timeout` bounds
# each oracle (the closure family costs 10-50+ min each at sf1).
#
# Order: cheap queries first (tmp/sf1_todo_cheap.txt), closure family last
# (tmp/sf1_todo_closure.txt) with a longer per-oracle timeout. Results append
# to tmp/compare_sf1_r18.out; a `tmp/sweep_pause` file pauses between queries
# (so clean benches can own the box); `tmp/sweep_stop` stops it.
set -u
cd /root/repo
SF=tmp/sf1
DUMPS=tmp/verify_sf1
OUT=tmp/compare_sf1_r18.out
CHEAP_T=${CHEAP_T:-1800}
CLOSURE_T=${CLOSURE_T:-5400}
THREADS=${THREADS:-16}

run_one() {
  local q="$1" t="$2"
  while [ -f tmp/sweep_pause ]; do sleep 30; done
  [ -f tmp/sweep_stop ] && exit 0
  if grep -q "^${q} " "$OUT" 2>/dev/null; then return; fi
  local start=$(date +%s)
  timeout "$t" python3 tools/compare.py "$SF" "$DUMPS" \
      --only "$q" --threads "$THREADS" > tmp/sweep_one.out 2>&1
  local rc=$? end=$(date +%s)
  if [ $rc -eq 124 ]; then
    printf '%-32s TIMEOUT after %ss\n' "$q" "$t" >> "$OUT"
  else
    # first line of compare.py output is the per-query verdict line
    head -1 tmp/sweep_one.out | sed "s/\$/  [$((end-start))s]/" >> "$OUT"
  fi
}

while read -r q; do run_one "$q" "$CHEAP_T"; done < tmp/sf1_todo_cheap.txt
while read -r q; do run_one "$q" "$CLOSURE_T"; done < tmp/sf1_todo_closure.txt
echo "SWEEP DONE $(date)" >> "$OUT"
