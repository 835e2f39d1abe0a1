"""Multimodal columns for training-data pipelines — SURVEY.md §2.11
(#74) plus the binary decode / feature-extract plumbing.

Design: media payloads are opaque ``binary`` columns with typed
metadata travelling beside them; decode / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
through Python row objects. The image/audio codec libraries are not
in this container, so the codec call itself is STUBBED: DECODERS maps
modality → callable, and the default entries raise
NotImplementedError("codec not installed") — production swaps in
Pillow/torchaudio/pyav. ``fake_decode`` is a deterministic
bytes-derived stand-in used by tests to exercise the full Spark
plumbing (schema, batching, partitioning) end to end.

Scale notes: mapInPandas streams Arrow record batches — payload
bytes cross to Python once per batch, not per row; size
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
payloads fits executor-python memory (e.g. 64 for 4 MB images).
Feature outputs are narrow rows → the downstream joins/aggs are
ordinary columnar work.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_metadata_collect_spark.registry import register
from hive_metadata_collect_spark.sources.fixtures import load_table

#: modality → decoder(payload: bytes) -> dict of features.
#: Production installs real codecs here; absent codecs raise.
DECODERS: dict[str, Callable[[bytes], dict]] = {}


def _missing_codec(name: str) -> Callable[[bytes], dict]:
    def decode(payload: bytes) -> dict:
        raise NotImplementedError(
            f"{name} codec not installed in this environment; register a "
            f"decoder in DECODERS[{name!r}] (e.g. Pillow / pyav / torchaudio)"
        )

    return decode


for _m in ("image", "audio", "video"):
    DECODERS[_m] = _missing_codec(_m)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives pseudo width/height/
    duration from the payload bytes. Keeps the pipeline testable
    without codecs; NOT a real decode."""
    digest = hashlib.md5(payload).digest()
    return {
        "width": 64 + digest[0],
        "height": 64 + digest[1],
        "n_frames": 1 + digest[2] % 8,
    }


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    modality_col: str = "modality",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode/feature-extract stage over a binary payload column.

    ``decoder=None`` dispatches per-row modality via DECODERS (raises
    until real codecs are registered); tests pass ``fake_decode``.
    """

    out_schema = (
        "doc_id long, n_bytes long, payload_md5 string, "
        "width int, height int, n_frames int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf[payload_col], pdf[modality_col]
            ):
                data = bytes(payload)
                dec = decoder if decoder is not None else DECODERS[modality]
                feats = dec(data)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "payload_md5": hashlib.md5(data).hexdigest(),
                        "width": feats["width"],
                        "height": feats["height"],
                        "n_frames": feats["n_frames"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage: explode pseudo frame indices 0..n_frames
    and keep every Nth — the shape of real video frame extraction
    (sequence → explode → filter) without the codec."""
    return (
        decoded.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )


@register(
    "mm_doc_embedding_join",
    survey_row=74,
    oracle="""
    SELECT lang, label, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang, label
    """,
)
def mm_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: join the text modality to its
    embedding modality on the shared id, aggregate label × lang —
    the canonical cross-modality co-location join (at scale: bucket
    both tables by the id so this join is shuffle-free)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@register(
    "mm_binary_features",
    survey_row=74,
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, oracle-checked: build an opaque binary
    payload (utf-8 of text — a stand-in for real media bytes), push it
    through the Arrow mapInPandas decode stage, emit byte-level
    features. The md5/byte-count are SQL-expressible, so this proves
    the whole binary → pandas-batch → features path against the
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image").alias("modality"),
    )
    feats = decode_features(payloads, decoder=fake_decode)
    return feats.select("doc_id", "n_bytes", "payload_md5")


# fake_decode's md5-derived pseudo-dims, re-derived in DuckDB SQL so
# the Arrow decode stage itself is oracle-checkable: digest byte k of
# md5 = hex chars 2k+1..2k+2.
_SQL_HEXVAL = "(instr('0123456789abcdef', substring(md5(text), {pos}, 1)) - 1)"
_SQL_BYTE0 = f"({_SQL_HEXVAL.format(pos=1)} * 16 + {_SQL_HEXVAL.format(pos=2)})"
_SQL_BYTE1 = f"({_SQL_HEXVAL.format(pos=3)} * 16 + {_SQL_HEXVAL.format(pos=4)})"
_SQL_BYTE2 = f"({_SQL_HEXVAL.format(pos=5)} * 16 + {_SQL_HEXVAL.format(pos=6)})"
_SQL_FAKE_DECODE = f"""
    SELECT doc_id,
           64 + {_SQL_BYTE0} AS width,
           64 + {_SQL_BYTE1} AS height,
           1 + {_SQL_BYTE2} % 8 AS n_frames
    FROM documents
"""


def _fake_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload — the stand-in media
    column all mm_* ops decode."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


@register(
    "mm_frame_sample",
    survey_row=74,
    oracle=f"""
    WITH dec AS ({_SQL_FAKE_DECODE})
    SELECT doc_id, frame_idx
    FROM (SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
          FROM dec)
    WHERE frame_idx % 2 = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling, end to end: binary payload → Arrow
    mapInPandas decode (frame count) → sequence-explode → keep every
    2nd frame. The decode is the deterministic fake (no codecs in this
    container), which the oracle recomputes from md5 — so the whole
    decode→explode plumbing is hash-checked, not just smoke-run."""
    decoded = decode_features(_fake_payloads(spark, sf_dir), decoder=fake_decode)
    return sample_frames(decoded, every_nth=2)


@register(
    "mm_resize_plan",
    survey_row=74,
    oracle=f"""
    WITH dec AS ({_SQL_FAKE_DECODE})
    SELECT doc_id, width, height,
           CASE WHEN greatest(width, height) > 224
                THEN floor(width * 224 / greatest(width, height))::BIGINT
                ELSE width::BIGINT END AS out_w,
           CASE WHEN greatest(width, height) > 224
                THEN floor(height * 224 / greatest(width, height))::BIGINT
                ELSE height::BIGINT END AS out_h
    FROM dec
    """,
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: decode dims via the Arrow stage, then compute the
    fit-within-224px output geometry (aspect-preserving) as pure
    Catalyst arithmetic. Real pixel resampling belongs in the same
    mapInPandas stage as the decode; the *plan* (what drives batch
    sizing and output schema) is engine-side and oracle-checked."""
    decoded = decode_features(_fake_payloads(spark, sf_dir), decoder=fake_decode)
    g = F.greatest(F.col("width"), F.col("height"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.when(g > 224, F.floor(F.col("width") * 224 / g))
        .otherwise(F.col("width").cast("long"))
        .alias("out_w"),
        F.when(g > 224, F.floor(F.col("height") * 224 / g))
        .otherwise(F.col("height").cast("long"))
        .alias("out_h"),
    )
