"""CLI: ``python -m hive_metadata_collect_spark.collect [sf_dir] [out_dir]``
— run the full catalog collection and print the manifest."""

from __future__ import annotations

import os
import sys

from hive_metadata_collect_spark.collector import run_collection
from hive_metadata_collect_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, ".scratch", "collection"
    )
    spark = get_spark(app_name="hmcs-collect")
    manifest = run_collection(spark, sf_dir, out_dir)
    for r in manifest.collect():
        print(f"{r['artifact']:>22}  {r['n_rows']:>8} rows  {r['path']}")
    spark.stop()


if __name__ == "__main__":
    main()
