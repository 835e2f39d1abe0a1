"""Line up a bench.py JSON line against a baseline_duck.py log.

Usage: python tools/pair_ratio.py BENCH.json DUCK.txt

Prints the per-query ms table, the paired-subset totals and ratio,
and the unpaired (oracle-less) queries' walls — the exact numbers the
BASELINE.md pairing tables carry.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    bench_path, duck_path = sys.argv[1], sys.argv[2]
    b = json.load(open(bench_path))
    duck = {}
    for line in open(duck_path):
        parts = line.split()
        if (
            "ms" in line
            and not line.startswith("#")
            and "(no oracle)" not in line
            and not line.startswith("TOTAL")
            and len(parts) >= 3
        ):
            duck[parts[0]] = float(parts[1]) / 1000.0
    sq = b["queries"]
    common = [k for k in sq if k in duck]
    ts, td = sum(sq[k] for k in common), sum(duck[k] for k in common)
    for k in common:
        print(
            f"{k:<22} {sq[k] * 1000:9.1f} {duck[k] * 1000:9.1f} "
            f"{sq[k] / duck[k]:7.2f}x"
        )
    print(
        f"paired {len(common)}: spark {ts:.3f}s duck {td:.3f}s "
        f"ratio {ts / td:.2f}x | wins {sum(1 for k in common if sq[k] < duck[k])}"
    )
    for k in sq:
        if k not in duck:
            print(f"unpaired {k:<22} {sq[k] * 1000:9.1f} ms")


if __name__ == "__main__":
    main()
