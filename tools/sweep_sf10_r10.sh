#!/bin/bash
# Round-10 sf10 inventory sweep: the ops never swept at sf10 in r9
# (SWEEP_SF10_r9.log covered 292 of 468). PER-OP isolated processes
# with individual 900 s timeouts — the r10 refinement of r9's
# per-chunk design, after win_range_interval_frame's DuckDB oracle
# stalled a 12-op chunk for >20 min (one slow oracle must cost
# exactly one op's budget, not its chunk's). 12 ops are skipped as
# documented quadratic-oracle/pair-volume exceptions — their DuckDB
# twins (and for the exact-pair forms, the Spark side itself) are
# hours-infeasible at sf10 BY CONSTRUCTION; hash gates at sf0.001-1:
#   dedup_near_minhash dedup_near_minhash_lsh dedup_ngram_jaccard
#   dedup_embedding_cosine dedup_components dedup_containment
#   dedup_levenshtein sim_pairs_threshold sim_pairs_lsh
#   pipeline_clean_corpus pipeline_fuzzy_dedup_keep_best
#   cat_lineage_sql_columns sort_skyline_2d (found mid-sweep: its
#   oracle IS the quadratic NOT EXISTS formulation by design)
set -u
cd /root/repo
TODO=/tmp/sf10_r10_run.txt
OUT=/root/repo/.scratch/sweep_sf10_r10_chunks.log
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
echo "SWEEP DONE" >> "$OUT"
