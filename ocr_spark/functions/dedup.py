"""Deduplication operators for large-scale corpus curation.

All engine-side logic is native Catalyst (hashes, higher-order array fns,
shuffles on the dedup key). Portable hashing uses md5 so the DuckDB oracle
can reproduce signatures bit-for-bit.

Scale notes (100 TB):
- exact_dedup shuffles once on the content hash — map-side partial aggs
  apply; the hash (not the text) is the shuffle key, so wide rows don't
  travel twice.
- minhash_lsh shuffles once per band on (band, signature); candidate pairs
  explode only within buckets, never across the corpus.
- ngram_jaccard_pairs is quadratic within its blocking key — use only behind
  LSH blocking or a bounded group (here: lang+source blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(text, n: int = 3):
    """Ordered n-gram word shingles of a text column (array<string>)."""
    words = F.split(F.trim(text), r"\s+")
    cnt = F.size(words)
    return F.when(cnt >= n, F.array_distinct(F.transform(
        F.sequence(F.lit(1), cnt - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.get(words, i - 1 + j) for j in range(n)]),
    ))).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content hash; keeps min-id representative."""
    return (
        df.withColumn("content_hash", F.sha2(F.col(text_col), 256))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Per-band minhash signature: min over md5(band || shingle). Portable
    (md5 exists in every engine) and deterministic. One row per (id, band)."""
    sh = word_shingles(F.col(text_col), shingle_n)
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    out = df.select(F.col(id_col).alias("doc"), sh.alias("shingles")).select(
        "doc", "shingles", bands
    )
    sig = F.array_min(
        F.transform(
            F.col("shingles"),
            lambda s: F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), s)),
        )
    )
    return out.select("doc", "band", sig.alias("signature")).filter(F.col("signature").isNotNull())


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs: ids sharing any band signature. The shuffle
    key is (band, signature) — bucket-local joins only."""
    sigs = minhash_signatures(df, id_col, text_col, n_bands, shingle_n)
    grouped = sigs.groupBy("band", "signature").agg(F.collect_set("doc").alias("docs"))
    pairs = (
        grouped.filter(F.size("docs") > 1)
        .select(F.explode(_pairs_expr(F.array_sort("docs"))).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    return pairs


def _pairs_expr(sorted_docs):
    """All ordered pairs (a<b) from a sorted array, as array<struct<a,b>>."""
    n = F.size(sorted_docs)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.get(sorted_docs, i - 1).alias("a"),
                    F.get(sorted_docs, j - 1).alias("b"),
                ),
            ),
        )
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_cols: list[str], shingle_n: int = 3,
                        threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key."""
    base = df.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in block_cols],
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = base.select(F.col("doc").alias("doc_a"), *block_cols, F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc").alias("doc_b"), *block_cols, F.col("sh").alias("sh_b"))
    joined = a.join(b, on=block_cols).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.select("doc_a", "doc_b", F.round(jac, 9).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 2) -> DataFrame:
    """64-bit SimHash from shingle md5 bits: for each of 64 bit positions, the
    majority vote across shingle hashes. Native bit arithmetic (conv on md5
    hex nibbles), no Python."""
    sh = word_shingles(F.col(text_col), shingle_n)
    base = df.select(F.col(id_col).alias("doc"), sh.alias("shingles"))
    # per shingle: first 16 hex chars of md5 -> 64-bit value
    hashes = F.transform(F.col("shingles"), lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("decimal(20,0)").cast("long"))
    n = F.size(F.col("shingles"))
    # bit b of simhash = 1 if count(hashes with bit b set) * 2 >= n
    def _bit_counter(mask: int):
        # NB: no default-arg closures in HOF lambdas — pyspark's lambda
        # introspection binds a Column to every declared parameter.
        return lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(0)

    bit_cols = []
    for b in range(60):
        cnt = F.aggregate(hashes, F.lit(0), _bit_counter(1 << b))
        bit_cols.append(F.when((cnt * 2 >= n) & (n > 0), F.lit(1 << b)).otherwise(F.lit(0)))
    sim = bit_cols[0]
    for c in bit_cols[1:]:
        sim = sim + c
    return base.select("doc", sim.alias("simhash"))
