"""Re-measure the DuckDB oracle baseline for the 20 headline queries
(median of 3, full fetch) on the CURRENT fixtures and machine.

The headline oracle SQL comes straight from the registry (same SQL the
driver's correctness gate runs), so the baseline always matches the
operator semantics actually shipped. Usage:
    python tools/baseline_duck.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

from bench import DEMO, HEADLINE
from hive_metadata_collect_spark import registry


def main() -> None:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    def fresh_con():
        con = duckdb.connect()
        con.execute("SET timezone='UTC'")
        # Bounded-memory discipline (r12, r11 verdict item 6): cap the
        # allocator and give it a spill dir, mirroring the 32g-bounded
        # Spark driver it is paired against. Uncapped, the
        # q_hashed_features oracle at sf10 grows past RAM and the
        # KERNEL kills the process (unrecoverable from Python — the r11
        # sweep had to run as two processes); capped, DuckDB spills and
        # completes in 26.6 s, a real timed point (Spark: ~4.9 s).
        mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "24GB")
        spill = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch", "duck_spill",
        )
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{spill}'")
        for t in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):  # multi-file (tools/make_sf10x.py)
                path = f"{path}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con

    def _timed(con, sql):
        con.execute(sql).fetchall()  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        return rows, statistics.median(times)

    def _rebuild(old):
        """Close a poisoned connection and build a fresh one. The dying
        instance's buffers are released asynchronously, so an immediate
        duckdb.connect() can itself die with a tiny bad-allocation (the
        r12 sf10 q_hashed_features run lost the whole pairing to a
        45 KB alloc failure inside fresh_con) — gc + backoff retries."""
        import gc

        try:
            old.close()
        except Exception:
            pass
        del old
        for delay in (0.5, 2.0, 5.0, 10.0):
            gc.collect()
            time.sleep(delay)
            try:
                return fresh_con()
            except duckdb.Error:
                continue
        return fresh_con()  # final attempt — let a real failure raise

    con = fresh_con()
    ops = registry.load_all()
    total = 0.0
    demo_total = 0.0
    print(f"# DuckDB {duckdb.__version__} @ {sf_dir}")
    # DEMO queries are paired last; they count into TOTAL (mirroring
    # bench.py's contract-preserving payload) and a TOTAL_EX_DEMOS
    # line additionally reports the engine-only sum.
    for key, op_name in list(HEADLINE.items()) + list(DEMO.items()):
        is_demo = key in DEMO
        if only is not None and key not in only:
            continue
        # Bench-helper names (registry._BENCH_HELPERS, e.g. the
        # q_minhash_lsh production path) have no oracle BY DESIGN —
        # the registered contract op's oracle times the exact twin,
        # which is a different (quadratic) computation and would be
        # the dishonest pairing BASELINE.md's q_token_bucket
        # precedent bans.
        op = ops.get(op_name)
        sql = op.oracle if op is not None else None
        if sql is None:
            print(f"{key:<22} (no oracle)")
            continue
        note0 = ""
        if key == "q_json_ingested":
            # Same-work pairing (r12 verdict item 7): Spark's side of
            # this op is parse-once-at-ingest — the JSON parse happens
            # in the UNTIMED warm pass and the timed runs scan the
            # typed column. Pairing that against an oracle that
            # re-parses JSON inside the timed region would flatter
            # Spark, so the oracle gets the identical amortization: a
            # parse-once table built OUTSIDE the timed region, and the
            # timed SQL scans the typed column. The registry oracle
            # (used by the driver's correctness gate) is unchanged.
            try:
                con.execute(
                    "CREATE OR REPLACE TABLE params_ingested AS "
                    "SELECT event_type, CAST(json_extract_string(props,"
                    " '$.k') AS BIGINT) AS k_val FROM events"
                )
                sql = (
                    "SELECT event_type, round(avg(k_val), 4) AS avg_k,"
                    " count(*) AS n_events FROM params_ingested"
                    " GROUP BY event_type"
                )
                note0 = " (ingest-amortized: parse-once table untimed)"
            except duckdb.Error:
                con = _rebuild(con)
                note0 = " (WARNING ingest table failed; timing re-parse)"
        # An error on one query must not kill the whole pairing run
        # (r7/r9: q_hashed_features OOMs DuckDB materializing the
        # 500k x 1024 feature matrix at sf10; r12: the OOM can also
        # invalidate the connection so the NEXT query dies with a
        # FatalException the old OutOfMemoryException-only handler let
        # escape, silently truncating the pairing log). Catch every
        # duckdb error, rebuild the connection, and retry a capped OOM
        # once under a larger — still kernel-safe — limit, annotating
        # the line with the limit that produced the timed point.
        note = note0
        try:
            rows, med = _timed(con, sql)
        except duckdb.Error as e:
            con = _rebuild(con)
            if isinstance(e, duckdb.OutOfMemoryException):
                retry_mem = os.environ.get(
                    "SPARK_GRAFT_DUCK_MEM_RETRY", "64GB"
                )
                try:
                    con.execute(f"SET memory_limit='{retry_mem}'")
                    rows, med = _timed(con, sql)
                    note = note0 + f" ({retry_mem} limit)"
                except duckdb.Error as e2:
                    print(f"{key:<22} (OOM even at {retry_mem}: "
                          f"{str(e2)[:40]})")
                    con = _rebuild(con)
                    continue
                finally:
                    try:
                        mem0 = os.environ.get(
                            "SPARK_GRAFT_DUCK_MEM", "24GB"
                        )
                        con.execute(f"SET memory_limit='{mem0}'")
                    except duckdb.Error:
                        pass
            else:
                print(f"{key:<22} (error: {str(e)[:60]})")
                continue
        total += med
        if is_demo:
            demo_total += med
            print(f"{key:<22} {med * 1000:8.1f} ms  rows={len(rows)}"
                  f" (demo){note}")
        else:
            print(f"{key:<22} {med * 1000:8.1f} ms  rows={len(rows)}{note}")
    print(f"{'TOTAL':<22} {total * 1000:8.1f} ms")
    print(f"{'TOTAL_EX_DEMOS':<22} {(total - demo_total) * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
