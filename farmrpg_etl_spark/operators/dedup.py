"""Deduplication operators.

Reference forms (SURVEY.md §2.4): D2 bounded seen-cache → keyed
dedup; D3 unique-index insert dedup → keep-one-per-key.

LLM-pipeline forms (north star): exact content dedup, MinHash+LSH,
SimHash, n-gram Jaccard — all built on the portable md5 primitives in
``farmrpg_etl_spark.functions.hashing`` so every step is
whole-stage-codegen'd and reproducible across engines.

Scale notes (100 TB):
* exact dedup = groupBy(digest) — one shuffle on a uniform hash key,
  no skew by construction.
* minhash: signature computation is embarrassingly parallel
  (per-row); the LSH bucket join shuffles on (band_key) which is
  uniform; candidate verification touches only bucket-collision
  pairs, never the cross product.
* never collect(); candidate pair sets remain DataFrames.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from farmrpg_etl_spark.functions import hashing as H
from farmrpg_etl_spark.operators.latest import latest_per_key


def keep_first_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: Sequence[str] = ()
) -> DataFrame:
    """D2/D3 batch form — deterministic keep-one-per-key (earliest by
    ``order_col``; reference relies on a unique index + swallowed
    violation, db/chat.py:13-19). Unlike dropDuplicates this is
    deterministic under retries/reordering."""
    ordering = [F.col(order_col).asc()] + [F.col(t).asc() for t in tiebreak]
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-content dedup: md5 digest groupBy, keep min id per digest.

    Returns the surviving rows (one per distinct content)."""
    digest = F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").cast("binary"))
    with_digest = df.withColumn("__digest", digest)
    keep = with_digest.groupBy("__digest").agg(F.min(F.col(id_col)).alias(id_col))
    return (
        with_digest.join(keep, on=["__digest", id_col], how="inner")
        .drop("__digest")
        .select(*df.columns)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature → (id, sig: array<string>)."""
    sh = H.shingles(F.col(text_col), shingle_k)
    return df.select(
        F.col(id_col),
        H.minhash_signature(sh, num_hashes).alias("sig"),
        sh.alias("__shingles"),
    )


def lsh_buckets(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Explode signatures into (band_id, band_key, id) bucket rows."""
    keys = H.lsh_band_keys(F.col("sig"), bands, rows_per_band)
    return sigs.select(
        F.col(id_col), F.posexplode(keys).alias("band_id", "band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    shingle → minhash → band → bucket self-join (candidates) →
    array_intersect Jaccard filter. Output: (id_a, id_b, jaccard)
    with id_a < id_b, distinct.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    buckets = lsh_buckets(sigs, id_col, bands, rows_per_band)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = sigs.select(F.col(id_col), F.col("__shingles"))
    pairs = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__shingles", "sh_b"), "id_b")
        .withColumn("jaccard", F.round(H.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) 16-bit fingerprints; identical fingerprints are
    near-duplicate candidates (group or self-join on the value)."""
    return df.select(
        F.col(id_col), H.simhash16(H.words(F.col(text_col))).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (e.g. language).

    Blocking bounds the pair count; at scale choose a block with
    near-uniform sizes or add a secondary length-band block. Output
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col),
        F.col(block_col).alias("__block"),
        H.shingles(F.col(text_col), shingle_k).alias("__sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__block") == F.col("b.__block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(H.jaccard(F.col("a.__sh"), F.col("b.__sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
    )
