"""Generate the Iceberg manifest-list + manifest Avro fixtures.

Writes the three `snap-<id>-1.avro` manifest lists that
fixtures/iceberg_table/metadata/v{1,2,3}.metadata.json already name,
plus the `m-000{1,1r,2,3}.avro` manifest files they reference, using
the spec-conformant subset schemas in
hive_metadata_collect_spark/sources/avro_light.py (null codec, fixed
sync marker → byte-reproducible output). Also writes
`manifest_entries.json` — the NDJSON projection of the same entries
that the DuckDB oracle reads, so the oracle re-derives the pruning
plan from data it did NOT obtain through our Avro reader.

The numbers are wired to the committed metadata JSON so the two
fixture layers cross-check: snapshot summaries say +100, +150,
+80/-50 records → live rows at snapshot 3 = 280, which is exactly
what the live manifest entries below sum to (f-a1 50 + f-b1..b3 150 +
f-c1,c2 80; f-a2's 50 deleted by the overwrite).

Run from the repo root: python tools/make_iceberg_manifests.py
(idempotent — fixed sync marker, fixed content).
"""

from __future__ import annotations

import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_metadata_collect_spark.sources.avro_light import write_ocf

META_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "iceberg_table",
    "metadata",
)

_KV_BOUNDS = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k126_v127",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "lower_bounds", "type": ["null", _KV_BOUNDS]},
                    {"name": "upper_bounds", "type": ["null", _KV_BOUNDS]},
                ],
            },
        },
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

SNAP1 = 3051729675574597004
SNAP2 = 3055729675574597111
SNAP3 = 3060729675574597999


def _bound(v: int) -> bytes:
    """Iceberg single-value serialization for long: 8-byte LE."""
    return struct.pack("<q", v)


def _entry(status, snap, path, n, size, lo, hi):
    return {
        "status": status,
        "snapshot_id": snap,
        "data_file": {
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": n,
            "file_size_in_bytes": size,
            "lower_bounds": [{"key": 1, "value": _bound(lo)}],
            "upper_bounds": [{"key": 1, "value": _bound(hi)}],
        },
    }


# status: 1=ADDED (in this manifest's snapshot), 0=EXISTING (carried
# through a rewrite), 2=DELETED (dropped by this snapshot).
MANIFESTS = {
    "m-0001.avro": [  # snapshot 1 append
        _entry(1, SNAP1, "data/f-a1.parquet", 50, 6400, 1, 100),
        _entry(1, SNAP1, "data/f-a2.parquet", 50, 6500, 101, 200),
    ],
    "m-0002.avro": [  # snapshot 2 append
        _entry(1, SNAP2, "data/f-b1.parquet", 50, 6600, 201, 300),
        _entry(1, SNAP2, "data/f-b2.parquet", 50, 6700, 301, 400),
        _entry(1, SNAP2, "data/f-b3.parquet", 50, 6800, 401, 500),
    ],
    "m-0001r.avro": [  # snapshot 3 rewrite of m-0001: a2 deleted
        _entry(0, SNAP1, "data/f-a1.parquet", 50, 6400, 1, 100),
        _entry(2, SNAP3, "data/f-a2.parquet", 50, 6500, 101, 200),
    ],
    "m-0003.avro": [  # snapshot 3 new appends
        _entry(1, SNAP3, "data/f-c1.parquet", 40, 5100, 96, 180),
        _entry(1, SNAP3, "data/f-c2.parquet", 40, 5200, 181, 260),
    ],
}


def _mf(path, length, added_snap, a, e, d, ar, er, dr):
    return {
        "manifest_path": path,
        "manifest_length": length,
        "partition_spec_id": 0,
        "added_snapshot_id": added_snap,
        "added_files_count": a,
        "existing_files_count": e,
        "deleted_files_count": d,
        "added_rows_count": ar,
        "existing_rows_count": er,
        "deleted_rows_count": dr,
    }


def main() -> None:
    lengths = {}
    for name, entries in MANIFESTS.items():
        data = write_ocf(MANIFEST_ENTRY_SCHEMA, entries)
        lengths[name] = len(data)
        with open(os.path.join(META_DIR, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes, {len(entries)} entries")

    lists = {
        f"snap-{SNAP1}-1.avro": [
            _mf("m-0001.avro", lengths["m-0001.avro"], SNAP1,
                2, 0, 0, 100, 0, 0),
        ],
        f"snap-{SNAP2}-1.avro": [
            _mf("m-0002.avro", lengths["m-0002.avro"], SNAP2,
                3, 0, 0, 150, 0, 0),
            _mf("m-0001.avro", lengths["m-0001.avro"], SNAP1,
                2, 0, 0, 100, 0, 0),
        ],
        f"snap-{SNAP3}-1.avro": [
            _mf("m-0003.avro", lengths["m-0003.avro"], SNAP3,
                2, 0, 0, 80, 0, 0),
            _mf("m-0001r.avro", lengths["m-0001r.avro"], SNAP3,
                0, 1, 1, 0, 50, 50),
            _mf("m-0002.avro", lengths["m-0002.avro"], SNAP2,
                3, 0, 0, 150, 0, 0),
        ],
    }
    for name, files in lists.items():
        data = write_ocf(MANIFEST_LIST_SCHEMA, files)
        with open(os.path.join(META_DIR, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes, {len(files)} manifests")

    # NDJSON projection for the DuckDB oracle: one row per
    # (manifest-list, manifest, entry), bounds already decoded.
    proj_path = os.path.join(META_DIR, "manifest_entries.json")
    with open(proj_path, "w") as f:
        for lname, files in lists.items():
            for mf in files:
                for e in MANIFESTS[mf["manifest_path"]]:
                    d = e["data_file"]
                    f.write(
                        json.dumps(
                            {
                                "list_file": lname,
                                "manifest_path": mf["manifest_path"],
                                "status": e["status"],
                                "file_path": d["file_path"],
                                "record_count": d["record_count"],
                                "file_size_in_bytes": d[
                                    "file_size_in_bytes"
                                ],
                                "lower_ev": struct.unpack(
                                    "<q", d["lower_bounds"][0]["value"]
                                )[0],
                                "upper_ev": struct.unpack(
                                    "<q", d["upper_bounds"][0]["value"]
                                )[0],
                            },
                            separators=(",", ":"),
                        )
                        + "\n"
                    )
    print(f"manifest_entries.json written")


if __name__ == "__main__":
    main()
