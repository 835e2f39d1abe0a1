"""Deduplication operators for LLM training-data pipelines —
SURVEY.md §2.11 (#67, #68) plus a canonical-fingerprint variant and
the MinHash-LSH scale path.

Scale notes: exact dedup (#67) is a single hash-groupBy on a 16-byte
digest — shuffles digests, not documents. The exact near-dup path
(#68) generates candidates via an inverted-index self-join (pairs
must share ≥1 token) and computes Jaccard from co-occurrence counts;
correct at any SF, but its candidate volume is driven by document
frequency — at 100 TB you first drop ultra-high-DF tokens (they pair
everything with everything) and/or switch to the MinHash-LSH
banding variant (dedup_near_minhash_lsh below): signatures + band
buckets bound candidates independently of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_metadata_collect_spark.registry import register
from hive_metadata_collect_spark.sources.fixtures import load_table

_JACCARD_TAU = 0.95


@register(
    "dedup_exact",
    survey_row=67,
    oracle="""
    SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_doc
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text): digest → groupBy → keep
    the lowest doc_id as the canonical survivor."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "dedup_fingerprint",
    survey_row=67,
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fingerprint,
           count(*) AS n_docs, min(doc_id) AS keep_doc
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-fingerprint dedup: documents whose sorted distinct
    word sets are identical (catches reorderings/repetitions that
    byte-exact md5 misses). Same groupBy-digest plan as #67."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " "
        ).cast("binary")
    )
    return (
        d.groupBy(fp.alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "dedup_near_minhash",
    survey_row=68,
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.ws, b.ws))::DOUBLE /
                 (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6)
               AS jaccard
    FROM w a JOIN w b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
          (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= {_JACCARD_TAU}
    """,
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with word-set Jaccard ≥ τ (exact).

    Distributed algorithm (no all-pairs materialization):
      1. explode distinct tokens → (doc, token)
      2. self-join on token → co-occurrence count = |A ∩ B|
         (only pairs sharing ≥1 token are ever generated)
      3. |A ∪ B| = |A| + |B| − |A ∩ B| from per-doc set sizes
    The oracle cross-checks with literal all-pairs SQL at small SF.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("word"),
    )
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = words.select(F.col("doc_id").alias("doc_a"), "word")
    b = words.select(F.col("doc_id").alias("doc_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    jac = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _JACCARD_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register("dedup_near_minhash_lsh", survey_row=68, oracle=None)
def dedup_near_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates — the 100 TB path for #68.

    Pipeline: distinct tokens → hashed term-presence vectors
    (HashingTF, fixed 2^14 space) → MinHashLSH signatures (seeded,
    deterministic) → approxSimilarityJoin at Jaccard distance ≤ 0.3.
    Candidate volume scales with corpus × bands, not corpus².
    Approximate (LSH recall < 1) → rows-only driver check; recall vs
    the exact operator is asserted in tests/test_edge_cases.py.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(tokens)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return pairs.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
        F.round(1 - F.col("jaccard_dist"), 6).alias("est_jaccard"),
    )
