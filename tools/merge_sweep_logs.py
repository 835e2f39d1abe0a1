"""Merge the per-worker sf10 sweep outputs into SWEEP_SF10_r10.log.

Produces one committed artifact: a header documenting protocol and
coverage accounting, one line per op (fresh r10 runs first, then the
r9-carried lines for ops unchanged since SWEEP_SF10_r9.log was cut),
and explicit documented-skip lines for the quadratic-oracle/pair-volume
exceptions so "full inventory swept-or-documented" is checkable by
counting lines against the registry.

Usage: python tools/merge_sweep_logs.py logA logB [...] > SWEEP_SF10_r10.log
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SKIPS = {
    "dedup_near_minhash": "exact all-pairs Jaccard oracle: ~18.1e9 pairs at sf10 by construction",
    "dedup_near_minhash_lsh": "bound contract re-derives the exact pair set: same 18.1e9-pair wall",
    "dedup_ngram_jaccard": "shingle inverted-index oracle joins explode past memory at sf10",
    "dedup_embedding_cosine": "exact cosine pair oracle is quadratic in corpus size",
    "dedup_components": "pair-graph input is the 18.1e9-pair set (engine-side wall documented r10; see dedup_components_star, hash-exact AT sf10)",
    "dedup_containment": "containment pair oracle is quadratic in corpus size",
    "dedup_levenshtein": "51M-row pair output at sf1 already; quadratic at sf10",
    "sim_pairs_threshold": "exact threshold pair oracle is quadratic (200k vectors -> 2e10 dots)",
    "sim_pairs_lsh": "bound contract re-derives the exact pair set: same quadratic wall",
    "pipeline_decontaminate_embed": "exact train x eval cross-set scoring: 1.8M x 200k = 3.6e11 cosine evaluations at sf10 on BOTH engines by construction; the SRP-bucketed _lsh twin is the production scale path, gated by this exact twin at sf0.001-1",
    "pipeline_decontaminate_embed_lsh": "bound contract re-derives the exact train x eval hit set: same 3.6e11 wall (production SRP-bucket path itself is sf10-shaped; hash gates at sf0.001-1)",
    "pipeline_clean_corpus": "composes the near-dup pair stages above",
    "pipeline_fuzzy_dedup_keep_best": "composes the near-dup pair stages above",
    "cat_lineage_sql_columns": "recursive column-graph oracle is quadratic in edge closure at sf10 (>45 min, r9-documented)",
    "sim_knn_batch": "exact brute-force batch retrieval: the 1%-probe batch makes the scored intermediate |Q|x|corpus| = 4e10 rows at sf10 on BOTH engines by construction; the sf10-swept scale paths are the IVF/PQ/IVFPQ contracts",
    "sort_skyline_2d": "oracle IS the quadratic NOT-EXISTS formulation by design (op docstring); Spark's linear frontier verified ENGINE-OK at sf10 (11.5 s)",
}

LINE = re.compile(r"^(\S+)\s+([\d.]+)s\s+(\S.*)$")


def main() -> None:
    import __spark_entry__ as entry

    registry_ops = list(entry.queries().keys())
    fresh: dict[str, str] = {}
    for path in sys.argv[1:]:
        for raw in open(path):
            m = LINE.match(raw.strip())
            if m and m.group(1) in registry_ops:
                fresh.setdefault(m.group(1), raw.rstrip())
    carried: dict[str, str] = {}
    for raw in open("SWEEP_SF10_r9.log"):
        m = LINE.match(raw.strip())
        if m and m.group(1) in registry_ops:
            carried.setdefault(m.group(1), raw.rstrip())

    out = []
    missing = []
    for op in sorted(registry_ops):
        if op in SKIPS:
            out.append(f"{op:42s} SKIP documented: {SKIPS[op]}")
        elif op in fresh:
            out.append(fresh[op])
        elif op in carried:
            out.append(f"{carried[op]}   [r9 log; module unchanged since]")
        else:
            missing.append(op)
            out.append(f"{op:42s} MISSING")

    n_fresh = sum(1 for op in registry_ops if op in fresh and op not in SKIPS)
    n_carried = sum(
        1 for op in registry_ops
        if op not in fresh and op in carried and op not in SKIPS
    )
    print("# sf10 full-inventory driver-contract sweep, round 10")
    print("# per-op isolated processes, 900 s individual timeouts, three workers")
    print("# (two forward halves + one reverse cross-marking tail-eater);")
    print("# contract_sweep.py --driverlike --max-rows 2000000 --driver-mem 24g")
    print(f"# coverage: {len(registry_ops)} registry ops = {n_fresh} swept fresh this round")
    print(f"# + {n_carried} carried from SWEEP_SF10_r9.log (module unchanged since that log was cut)")
    print(f"# + {len(SKIPS)} documented quadratic-oracle/pair-volume skips (hash gates for these live at sf0.001-1)")
    print("# rows-only(N): Spark row count over the 2M-row compare cap; value-hash gates for")
    print("# those ops live at sf0.01 (driver scale) and sf0.1/sf1 sweeps.")
    for line in out:
        print(line)
    if missing:
        print(f"# WARNING: {len(missing)} ops missing from all inputs", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
