#!/bin/bash
# Third sf10 sweep worker: walks the COMBINED todo in REVERSE so it
# eats the tail the two forward workers would reach last. Before each
# op it checks EVERY worker log; after each op it appends the result
# line to the forward workers' logs too, so their own per-op grep
# check makes them skip work done here (short O_APPEND writes are
# atomic). At the crossover point at most one op runs twice.
set -u
cd /root/repo
TODO="$1"   # combined todo, will be read in reverse
OUT="$2"    # this worker's log
OTHERS="${3:-}"  # space-separated other logs to check and cross-mark
tac "$TODO" | while IFS= read -r op; do
  [ -z "$op" ] && continue
  hit=0
  for f in $OUT $OTHERS; do
    grep -q "^$op " "$f" 2>/dev/null && hit=1 && break
  done
  [ "$hit" = 1 ] && continue
  timeout 900 python tools/contract_sweep.py /root/repo/.scratch/sf10 \
    --driverlike --max-rows 2000000 --driver-mem 24g \
    --only "$op" 2>/dev/null | grep -E "^$op " >> "$OUT"
  rc=$?
  if ! grep -q "^$op " "$OUT"; then
    echo "$op  900.00s  TIMEOUT-or-crash rc=$rc" >> "$OUT"
  fi
  line=$(grep -m1 "^$op " "$OUT")
  for f in $OTHERS; do
    echo "$line" >> "$f"
  done
done
echo "WORKER DONE reverse $TODO" >> "$OUT"
