"""Shared exact-integer money kernels for the int64-partials +
DECIMAL-merge aggregation pattern (see agg_pricing_summary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Round-half-up a NON-NEGATIVE ≤2-fractional-digit money double to
    integer cents, without per-row BigDecimal work.

    ``F.round(x*100, 0)`` routes every row through a BigDecimal
    expansion of the double — measured 0.45 s of a 0.72 s 60M-row agg
    at sf10 (one idle session); this form is ``(x*100 + 0.5) → long``,
    a multiply-add plus truncating cast that stays in whole-stage
    codegen registers (same agg: 0.27 s, at the raw-scan floor).

    Exactness precondition (the TPC-H money domain, and why this is
    NOT a general round()): x ≥ 0 and the true value has ≤2 fractional
    digits, so x*100 is within ~1 ulp (≤1.9e-9 at the 1.1e7-cent max)
    of an integer N; adding 0.5 lands strictly inside (N, N+1) and the
    toward-zero cast truncates to exactly N — bit-identical to
    round-half-up and to the oracle's ::DECIMAL(12,2) cast. Verified
    sum-identical to the F.round form over all 60M sf10 lineitem rows
    for every money column. Negative values would truncate the wrong
    way — keep F.round for signed domains.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c * 100 + F.lit(0.5)).cast("long")
