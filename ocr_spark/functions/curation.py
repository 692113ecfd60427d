"""Corpus-curation operators beyond dedup: n-gram language-model quality
scoring (the CCNet/Gopher-style perplexity filter) and PII scrubbing.

Scale notes (100 TB):
- the LM is trained and applied in one lazy program: unigram/bigram counts
  are corpus-level hash aggregations (map-side partials, shuffle keyed on
  the gram), and scoring joins each document's exploded bigrams against the
  count tables — shuffles are keyed on gram strings, never on documents,
  so hot grams spread across reducers and AQE can split true skew;
- per-term log-probabilities are carried as exact BIGINT micro-nats
  (round(ln(p)*1e6)) so the per-document SUM is order-independent and
  bit-identical cross-engine (float sums over unordered groups are not);
- pii_scrub is a pure projection — codegen'd regexp_replace chain, no
  shuffle, safe to fuse into any scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Dialect-common PII patterns (Java regex / RE2 / Python re agree):
# emails, international-ish phone numbers, 12-digit aadhaar-style ids.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9]{2,3}[-\s][0-9]{5}[-\s][0-9]{5}\b"),
    ("id12", r"\b[0-9]{4}\s[0-9]{4}\s[0-9]{4}\b|\b[0-9]{12}\b"),
]


def pii_scrub(text: Column) -> tuple[Column, Column]:
    """Redact PII spans with typed placeholders; returns (scrubbed text,
    redaction count). Patterns apply in declaration order, so an email is
    never re-matched as a phone fragment."""
    scrubbed = text
    n = F.lit(0)
    for name, pat in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0)))
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{name.upper()}]")
    return scrubbed, n


def url_host_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-host crawl statistics (the host-level view every web-corpus
    filter starts from): host, TLD, document count, path-depth totals.
    Pure regexp parsing (dialect-common — no parse_url, which DuckDB
    lacks) + one hash aggregation keyed on host (map-side partials; hot
    hosts are exactly what this op is for measuring)."""
    url = F.col(url_col)
    # Scheme match is case-insensitive (RFC 3986 schemes are); the host
    # branch tries an IPv6/IPvFuture bracket literal first (inside which
    # ':' is not a port separator), then the reg-name form, where
    # [^/:?#]+ stops at the port colon / path / query with no lookahead
    # (RE2, the oracle dialect, has none). Hosts canonicalize lowercase.
    raw_host = F.regexp_extract(
        url, r"(?i)^[a-z][a-z0-9+.-]*://(\[[^\]]+\]|[^/:?#]+)", 1)
    host = F.lower(F.regexp_replace(raw_host, r"^\[|\]$", ""))
    path = F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    depth = (F.length(path) - F.length(F.regexp_replace(path, "/", ""))).cast("bigint")
    return (
        df.select(
            host.alias("host"),
            F.regexp_extract(host, r"\.([a-z]+)$", 1).alias("tld"),
            depth.alias("depth"),
        )
        .groupBy("host", "tld")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("depth").alias("sum_depth"),
            F.max("depth").alias("max_depth"),
        )
    )


def _doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    return df.select(F.col(id_col).alias("doc"), words.alias("words"))


def ngram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Bigram-LM document quality score, trained on the corpus itself and
    applied to every document (self-perplexity — boilerplate and gibberish
    score high, fluent in-domain text low).

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)  (add-one smoothing, V =
    distinct unigrams). Output per doc: n_terms, sum_logp_micro (exact
    BIGINT micro-nats), ppl = exp(-sum / n / 1e6) rounded to 6."""
    base = _doc_words(df, id_col, text_col)
    flat = base.select("doc", F.explode("words").alias("w"))
    uni = flat.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))

    n = F.size("words")
    m = n - 1
    bigrams = base.select(
        "doc",
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("words", 1, m), F.slice("words", 2, m),
                    lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,bg:string>>"))
        ).alias("t"),
    ).select("doc", F.col("t.w1").alias("w1"), F.col("t.bg").alias("bg"))

    big = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    joined = (
        bigrams.join(big, "bg")
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
    )
    # exact integer micro-nats: the only float op is one ln per DISTINCT
    # probability value; the per-doc SUM is integer (order-free)
    term = F.round(
        F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))) * 1000000
    ).cast("bigint")
    per_doc = joined.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(term).alias("sum_logp_micro"),
    )
    all_docs = base.select("doc").join(per_doc, "doc", "left")
    return all_docs.select(
        "doc",
        F.coalesce("n_terms", F.lit(0)).cast("bigint").alias("n_terms"),
        F.coalesce("sum_logp_micro", F.lit(0)).cast("bigint").alias("sum_logp_micro"),
        F.when(
            F.col("n_terms").isNotNull(),
            F.round(
                F.exp(-F.col("sum_logp_micro").cast("double") / F.col("n_terms") / 1000000.0), 6
            ),
        ).alias("ppl"),
    )
