"""Dump `.explain("formatted")` for named bench queries to
plans/r12/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r12.md).

Usage:
    python tools/dump_r12_plans.py <suffix> [sf_dir] [--out DIR] \
        [--only q_a,q_b]

`before` plans are produced by running this script inside a git
worktree checked out at the pre-optimization commit; `after` plans at
HEAD. The plan is the ANALYZED physical plan (AdaptiveSparkPlan
isFinalPlan=false) — the shape evidence (Exchange count, join
strategy, PushedFilters, codegen spans), not runtime AQE output.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

try:  # the r11 worktree's bench.py has no DEMO split
    from bench import DEMO  # noqa: E402
except ImportError:
    DEMO = {}
from hive_metadata_collect_spark import registry  # noqa: E402
from hive_metadata_collect_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    out_dir = None
    if "--out" in args:
        i = args.index("--out")
        out_dir = args[i + 1]
        del args[i : i + 2]
    suffix = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    if out_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_dir = os.path.join(repo, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="hmcs-r12-plans", shuffle_partitions=16)
    mapping = {**HEADLINE, **DEMO}
    n = 0
    for key, op_name in mapping.items():
        if only is not None and key not in only:
            continue
        if not registry.resolvable(op_name):
            continue
        df = registry.build_frame(spark, op_name, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(
                f"# {key} ({op_name}) — explain('formatted') at "
                f"{sf_dir}, spark {spark.version}, AQE on, shuffle=16\n\n"
            )
            f.write(buf.getvalue().rstrip() + "\n")
        n += 1
    print(f"wrote {n} plans to {out_dir} (suffix={suffix})")
    spark.stop()


if __name__ == "__main__":
    main()
