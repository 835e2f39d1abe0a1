#!/bin/bash
# One sf10 sweep worker: per-op isolated processes with individual
# timeouts (one slow oracle costs exactly one op's budget). Usage:
#   tools/sweep_worker.sh /tmp/todo.txt /root/repo/.scratch/out.log
set -u
cd /root/repo
TODO="$1"
OUT="$2"
while IFS= read -r op; do
  [ -z "$op" ] && continue
  grep -q "^$op " "$OUT" 2>/dev/null && continue
  timeout 900 python tools/contract_sweep.py /root/repo/.scratch/sf10 \
    --driverlike --max-rows 2000000 --driver-mem 24g \
    --only "$op" 2>/dev/null | grep -E "^$op " >> "$OUT"
  rc=$?
  if ! grep -q "^$op " "$OUT"; then
    echo "$op  900.00s  TIMEOUT-or-crash rc=$rc" >> "$OUT"
  fi
done < "$TODO"
echo "WORKER DONE $TODO" >> "$OUT"
