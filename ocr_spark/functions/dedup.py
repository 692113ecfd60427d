"""Deduplication operators for large-scale corpus curation.

All engine-side logic is native Catalyst (hashes, higher-order array fns,
shuffles on the dedup key). Portable hashing uses md5 so the DuckDB oracle
can reproduce signatures bit-for-bit.

Scale notes (100 TB):
- exact_dedup shuffles once on the content hash — map-side partial aggs
  apply; the hash (not the text) is the shuffle key, so wide rows don't
  travel twice.
- minhash_lsh shuffles once per band on (band, signature); candidate pairs
  explode only within buckets, never across the corpus, and oversize
  (boilerplate-degenerate) buckets are capped — see lsh_candidate_pairs.
- ngram_jaccard_pairs is quadratic within its blocking key; the corpus-scale
  composition is lsh_jaccard_pairs (exact Jaccard only on LSH candidates).

Id-uniqueness assumption: per-doc aggregating operators (minhash_signatures,
simhash64) group by the id column, so duplicate id values collapse to one
output row; callers own id uniqueness (the reference keys documents by url).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text, n: int = 3):
    """Ordered n-gram word shingles of a text column (array<string>).

    Built as zip_with over shifted slices, NOT transform(sequence(...)) with
    an outer `words` reference — an outer array referenced inside an HOF
    lambda is re-evaluated per element (O(W^2) per row, measured)."""
    words = F.split(F.trim(text), r"\s+")
    cnt = F.size(words)
    m = cnt - (n - 1)
    zipped = F.slice(words, 1, m)
    for j in range(1, n):
        zipped = F.zip_with(zipped, F.slice(words, j + 1, m),
                            lambda a, b: F.concat_ws(" ", a, b))
    return F.when(cnt >= n, F.array_distinct(zipped)).otherwise(
        F.array().cast("array<string>")
    )


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
    (md5 exists in every engine) and deterministic. One row per (id, band).

    Shape: explode shingles × bands into flat rows (md5 runs inside
    whole-stage codegen, not an interpreted HOF lambda), then one hash agg
    with map-side partial MIN — the same plan a 100 TB corpus wants."""
    sh = word_shingles(F.col(text_col), shingle_n)
    flat = (
        df.select(F.col(id_col).alias("doc"), F.explode(sh).alias("shingle"))
        .select("doc", "shingle",
                F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"))
    )
    return (
        flat.groupBy("doc", "band")
        .agg(F.min(F.md5(F.concat(F.col("band").cast("string"), F.lit("|"), F.col("shingle")))).alias("signature"))
    )


DEFAULT_MAX_BUCKET = 64


def _banded_buckets(df: DataFrame, id_col: str, text_col: str,
                    n_bands: int, shingle_n: int) -> DataFrame:
    """(band, signature, docs) LSH buckets — the shared base of the pair
    generator and its oversize-bucket observability views."""
    sigs = minhash_signatures(df, id_col, text_col, n_bands, shingle_n)
    return sigs.groupBy("band", "signature").agg(F.collect_set("doc").alias("docs"))


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n_bands: int = 4, shingle_n: int = 3,
                        max_bucket_size: int = DEFAULT_MAX_BUCKET,
                        observation=None) -> DataFrame:
    """Candidate near-dup pairs: ids sharing any band signature. The shuffle
    key is (band, signature) — bucket-local joins only.

    Degenerate-bucket cap (100 TB): mass-duplicated boilerplate puts 10^6
    docs behind ONE signature; gathering them into one collect_set row and
    exploding ~n² pairs in-row is a single-task OOM. Buckets larger than
    ``max_bucket_size`` are dropped — identical/boilerplate text shares
    EVERY signature, so its members are exact_dedup's job, not pairwise
    LSH's — which bounds any task at max_bucket_size² pairs.

    No-silent-caps: pass a ``pyspark.sql.Observation`` as ``observation``
    and the SAME action that produces the pairs records
    ``oversize_buckets`` (count dropped) and ``max_bucket_docs`` — zero
    extra pass; jobs log/alert on it (``observation.get`` after the
    action). :func:`lsh_oversize_buckets` lists the dropped buckets
    themselves for offline inspection."""
    grouped = _banded_buckets(df, id_col, text_col, n_bands, shingle_n)
    if observation is not None:
        grouped = grouped.observe(
            observation,
            F.sum(F.when(F.size("docs") > max_bucket_size, 1).otherwise(0))
            .alias("oversize_buckets"),
            F.max(F.size("docs")).alias("max_bucket_docs"),
        )
    pairs = (
        grouped.filter((F.size("docs") > 1) & (F.size("docs") <= max_bucket_size))
        .select(F.explode(_pairs_expr(F.array_sort("docs"))).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    return pairs


def lsh_oversize_buckets(df: DataFrame, id_col: str, text_col: str,
                         n_bands: int = 4, shingle_n: int = 3,
                         max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """The (band, signature, n_docs) buckets lsh_candidate_pairs DROPS under
    its cap — the offline view behind the no-silent-caps rule (for in-job
    accounting with no extra pass, pass an Observation to
    lsh_candidate_pairs instead)."""
    return (
        _banded_buckets(df, id_col, text_col, n_bands, shingle_n)
        .select("band", "signature", F.size("docs").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_size)
    )


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


def _hashed_shingles(text_col, shingle_n: int):
    """word_shingles md5-hashed to int64 — set ops over longs are several
    times cheaper than over shingle strings and shrink shuffled arrays ~3x.
    Collisions are negligible (60-bit space vs ~100 shingles/doc) and both
    engines hash identically, so values stay cross-engine exact."""
    return F.transform(
        word_shingles(text_col, shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("decimal(20,0)").cast("long"),
    )


def _jaccard(sh_a, sh_b):
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.round(
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 9
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        block_cols: list[str], shingle_n: int = 3,
                        threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    Quadratic within each block — ONLY safe when the blocking key bounds
    group size by construction. For corpus-scale near-dup work use
    :func:`lsh_jaccard_pairs`, which blocks on LSH buckets instead of a
    low-cardinality column key."""
    base = df.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in block_cols],
        _hashed_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = base.select(F.col("doc").alias("doc_a"), *block_cols, F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc").alias("doc_b"), *block_cols, F.col("sh").alias("sh_b"))
    joined = a.join(b, on=block_cols).filter(F.col("doc_a") < F.col("doc_b"))
    return (
        joined.select("doc_a", "doc_b", _jaccard("sh_a", "sh_b").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                      n_bands: int = 4, shingle_n: int = 3,
                      threshold: float = 0.0,
                      max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY on LSH candidate pairs — the
    100 TB composition: minhash banding prunes the corpus to bucket-local
    candidates (one shuffle on (band, signature), bounded buckets), then
    the exact set comparison runs per candidate pair (two hash joins on
    doc id), never quadratically within a low-cardinality block."""
    pairs = lsh_candidate_pairs(df, id_col, text_col, n_bands, shingle_n,
                                max_bucket_size)
    base = df.select(
        F.col(id_col).alias("doc"),
        _hashed_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    joined = (
        pairs.join(base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    return (
        joined.select("doc_a", "doc_b", _jaccard("sh_a", "sh_b").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, shingle_n: int = 2) -> DataFrame:
    """60-bit SimHash from shingle md5 bits: for each bit position, the
    majority vote across shingle hashes. Native bit arithmetic, no Python.

    Shape: explode shingles so the md5 + 60 conditional sums run codegen'd
    with map-side partial aggregation (one shuffle on doc). Docs with no
    shingles keep simhash 0 via explode_outer."""
    sh = word_shingles(F.col(text_col), shingle_n)
    flat = df.select(
        F.col(id_col).alias("doc"), F.explode_outer(sh).alias("shingle")
    ).select(
        "doc",
        F.when(
            F.col("shingle").isNotNull(),
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("decimal(20,0)").cast("long"),
        ).alias("h"),
    )
    aggs = [F.count(F.col("h")).alias("n")] + [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(0)).alias(f"c{b}")
        for b in range(60)
    ]
    g = flat.groupBy("doc").agg(*aggs)
    sim: Column = F.lit(0).cast("long")
    for b in range(60):
        sim = sim + F.when(
            (F.col(f"c{b}") * 2 >= F.col("n")) & (F.col("n") > 0), F.lit(1 << b)
        ).otherwise(F.lit(0))
    return g.select("doc", sim.alias("simhash"))


def dedup_decide(df: DataFrame, id_col: str, text_col: str,
                 threshold: float = 0.6,
                 n_bands: int = 4, shingle_n: int = 3,
                 max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Full corpus-retention pass: exact dedup -> LSH near-dup on the
    surviving representatives -> per-document keep/drop decision.

    The composition a real curation job runs (reference has no dedup at
    all; this is the training-data-pipeline surface):

    1. exact duplicates collapse by content hash (one shuffle on the
       sha256, never the text); the min-id of each hash group is kept;
    2. ONLY the representatives go through minhash banding + exact
       Jaccard on candidates (lsh_jaccard_pairs) — exact dups would
       otherwise flood every band bucket;
    3. of each near-dup pair above ``threshold`` the greater id drops.
       (Greedy pairwise, not connected components: a->b and b->c drops
       b and c without re-rooting c on a — the standard single-pass rule;
       transitive clustering is a separate graph job.)

    Returns (doc_id, decision, reason): decision in {keep, drop}, reason
    in {exact_dup, near_dup, none}. Scale shape: two hash-shuffles (hash,
    id) plus the LSH plan; the near-drop id set is tiny relative to the
    corpus and AQE broadcasts the final join.
    """
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
    )
    keep = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("keep_id"))
    docs = hashed.join(keep, "content_hash").select("doc_id", "text", "keep_id")
    reps = docs.filter(F.col("doc_id") == F.col("keep_id")).select("doc_id", "text")
    near_drop = (
        lsh_jaccard_pairs(reps, "doc_id", "text", n_bands, shingle_n,
                          threshold, max_bucket_size)
        .select(F.col("doc_b").alias("near_id"))
        .distinct()
    )
    out = docs.join(near_drop, docs.doc_id == near_drop.near_id, "left")
    is_exact = F.col("doc_id") != F.col("keep_id")
    is_near = F.col("near_id").isNotNull()
    return out.select(
        "doc_id",
        F.when(is_exact | is_near, F.lit("drop")).otherwise(F.lit("keep")).alias("decision"),
        F.when(is_exact, F.lit("exact_dup"))
        .when(is_near, F.lit("near_dup"))
        .otherwise(F.lit("none")).alias("reason"),
    )


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str = "node",
                         a_col: str = "doc_a", b_col: str = "doc_b",
                         max_iters: int = 25) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: returns (node, component) where component is the SMALLEST
    node id reachable from the node — a unique fixpoint, so the result is
    deterministic under any partitioning or iteration interleaving.

    The transitive-closure step dedup_decide deliberately leaves to a graph
    job: near-dup EDGES (a~b, b~c) become retention CLUSTERS ({a,b,c}),
    letting a curation pass keep exactly one representative per cluster
    (min id) instead of applying the greedy pairwise rule.

    Scale shape (the standard large-graph CC loop): the symmetrized edge
    list is computed once and cached, so each iteration is one join of the
    cached edges against the label table on node id plus one
    map-side-combined MIN aggregation; rounds needed =
    component diameter, and near-dup clusters are shallow (a handful of
    hops even at corpus scale — mass-duplication collapses through the
    shared minimum immediately). Labels are localCheckpoint()ed each round
    to truncate the lineage (swap for reliable checkpoint() on a real
    cluster) and convergence is detected by counting changed labels — one
    action per round, on data already materialized by the checkpoint.
    Raises if max_iters rounds do not converge (no silent partial result).
    """
    # Cache the symmetrized edge list: `edges` is typically an expensive
    # lazy pipeline (LSH + Jaccard), and without this every iteration of
    # the loop below would re-execute it from the source scan. persist()
    # (not checkpoint) keeps the relation visible to Catalyst, so AQE can
    # still coalesce its partitions and pick the join strategy per round;
    # the edge pipeline itself runs exactly once.
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    ).persist()
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)
    try:
        for _ in range(max_iters):
            prop = (
                sym.join(labels.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("cand"))
            )
            merged = (
                labels.join(prop, "node", "left")
                .select(
                    "node",
                    F.col("component").alias("_old"),
                    F.least(F.col("component"),
                            F.coalesce(F.col("cand"), F.col("component"))
                            ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = merged.filter(
                F.col("component") != F.col("_old")).count()
            labels = merged.select("node", "component")
            if changed == 0:
                return labels
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds max_iters)")


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 20, w: int = 4) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer et al. 2003): hash every
    character k-gram of the whitespace-normalized text, slide a w-hash
    window, keep each window's minimum, dedupe — a guarantee-bearing
    selection (any shared substring of length >= k + w - 1 yields a shared
    fingerprint) that exact- and word-shingle dedup lack. Returns one
    (doc, fp) row per distinct fingerprint.

    Any doc with >= k chars emits at least one fingerprint (docs shorter
    than w windows fall back to the global minimum hash).

    Scale shape: fingerprint selection is a pure per-row projection — zero
    shuffle; the k-gram hash array and the window minima are HOF transforms
    over MATERIALIZED attribute columns (an outer expression referenced
    inside an HOF lambda re-evaluates per element — the O(L^2) trap
    word_shingles documents), and the md5 is codegen'd JVM-side. Downstream
    joins shuffle on the 8-byte fingerprint, never the text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("doc"), norm.alias("norm"))
    m = F.length(F.col("norm")) - (k - 1)
    hashes = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.conv(
                F.substring(F.md5(F.col("norm").substr(i, F.lit(k))), 1, 8),
                16, 10,
            ).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    h = base.select("doc", hashes.alias("h"))
    n = F.size(F.col("h"))
    mins = (
        F.when(
            n >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - (w - 1)),
                    lambda j: F.array_min(F.slice(F.col("h"), j, w)),
                )
            ),
        )
        .when(n >= 1, F.array(F.array_min(F.col("h"))))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return h.select("doc", F.explode(mins).alias("fp"))


def winnow_pairs(df: DataFrame, id_col: str, text_col: str,
                 k: int = 20, w: int = 4, max_df: int = 10,
                 min_shared: int = 2) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints — the
    substring-overlap detector (plagiarism / quote / template reuse) built
    on winnow_fingerprints. Fingerprints appearing in > max_df documents
    are dropped before pairing (boilerplate fingerprints are stopwords
    here, and the max_df bound is what keeps the per-fingerprint pair
    fan-out at max_df^2 instead of corpus-quadratic — the same cap
    discipline as lsh_candidate_pairs, as an explicit parameter).

    Scale shape: one fingerprint-keyed count (map-side partials), one
    fingerprint-keyed self-join bounded by max_df per key, one
    (doc_a, doc_b)-keyed count. Returns (doc_a, doc_b, n_shared)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    rare = (
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("dfq"))
        .filter(F.col("dfq") <= max_df)
        .select("fp")
    )
    filtered = fps.join(rare, "fp")
    a = filtered.select(F.col("fp"), F.col("doc").alias("doc_a"))
    b = filtered.select(F.col("fp"), F.col("doc").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def keep_best_representative(comp: DataFrame, quality: DataFrame) -> DataFrame:
    """Retention decision over near-dup clusters: given component labels
    (node, component) and a per-node integer quality (node, quality_micro),
    keep the HIGHEST-quality member of each component (ties to the smallest
    node id) and drop the rest — the keep-best upgrade over min-id
    representatives, so a cluster's cleanest rendering survives dedup.

    Returns (node, component, quality_micro, keep).

    Scale shape: the argmax is a component-keyed MAX over
    struct(quality, -node) — an aggregation with map-side partials, NOT a
    per-component window sort, so the giant boilerplate component every web
    corpus has reduces map-side instead of sorting inside one reducer. One
    join back on the component completes the flag."""
    j = comp.join(quality, "node")
    best = j.groupBy("component").agg(
        F.max(
            F.struct(
                F.col("quality_micro").alias("q"),
                (-F.col("node")).alias("negnode"),
            )
        ).alias("b")
    )
    return (
        j.join(best, "component")
        .select(
            "node", "component", "quality_micro",
            (
                (F.col("quality_micro") == F.col("b.q"))
                & (F.col("node") == -F.col("b.negnode"))
            ).cast("int").alias("keep"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 2,
    n_bands: int = 4,
    hmax: int = 3,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded SimHash near-dup pairs — the pair-producing composition over
    :func:`simhash64`, completing the family the way lsh_candidate_pairs
    completes MinHash: split the 60-bit signature into ``n_bands``
    equal bands, docs sharing any band value are candidates, candidates
    verify by full-signature Hamming distance <= ``hmax``.

    With 60 bits in 4 bands, the pigeonhole bound makes banding EXACT for
    the hmax=3 radius (any pair within Hamming 3 leaves at least one band
    untouched) — a guarantee, not a recall heuristic.

    Scale shape: one doc-keyed simhash agg, then the candidate shuffle is
    keyed on (band, band-value) — bucket-local joins only; degenerate
    buckets (boilerplate => identical signatures) obey the same cap + obs
    discipline as lsh_candidate_pairs (cap² bounds any task; the capped
    mass is exact_dedup's job). The verify is a doc-keyed signature join
    + one xor/popcount per candidate — no text ever crosses the wire.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    band_bits = 60 // n_bands
    mask = (1 << band_bits) - 1
    sig = simhash64(df, id_col, text_col, shingle_n)
    bands = sig.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("sigb"),
                )
                for b in range(n_bands)
            ])
        ).alias("bs"),
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sigb").alias("sigb"))
    grouped = bands.groupBy("band", "sigb").agg(
        F.collect_set("doc").alias("docs"))
    pairs = (
        grouped.filter(
            (F.size("docs") > 1) & (F.size("docs") <= max_bucket_size))
        .select(F.explode(_pairs_expr(F.array_sort("docs"))).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    a = sig.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= hmax)
    )


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      n_bands: int = 4, shingle_n: int = 3,
                      min_bp: int = 8000,
                      max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Asymmetric containment over LSH candidates — the quote/fragment
    detector Jaccard misses: a 200-word excerpt inside a 10k-word page has
    Jaccard ~0.02 but containment ~1.0 on the excerpt side.

    containment(A in B) = |A ∩ B| / |A| over distinct hashed shingles,
    carried as exact basis points via integer division (10000*inter div
    |A|) so the cross-engine compare never meets a float-floor boundary.
    Emits one row per unordered candidate pair with BOTH directions
    (cont_a_bp, cont_b_bp), kept when either side clears ``min_bp``.

    Scale shape: identical to lsh_jaccard_pairs — banding prunes the
    corpus to bucket-local candidates, then two hash joins on doc id fetch
    the shingle sets; nothing quadratic, buckets capped."""
    pairs = lsh_candidate_pairs(df, id_col, text_col, n_bands, shingle_n,
                                max_bucket_size)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            _hashed_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    joined = (
        pairs
        .join(base.select(F.col("doc").alias("doc_a"),
                          F.col("sh").alias("sh_a")), "doc_a")
        .join(base.select(F.col("doc").alias("doc_b"),
                          F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
            .alias("inter"),
            F.size("sh_a").cast("bigint").alias("size_a"),
            F.size("sh_b").cast("bigint").alias("size_b"),
        )
    )
    cont_a = F.when(F.col("size_a") > 0,
                    F.expr("(10000 * inter) div size_a")).otherwise(F.lit(0))
    cont_b = F.when(F.col("size_b") > 0,
                    F.expr("(10000 * inter) div size_b")).otherwise(F.lit(0))
    return (
        joined
        .withColumn("cont_a_bp", cont_a.cast("bigint"))
        .withColumn("cont_b_bp", cont_b.cast("bigint"))
        .filter(F.greatest("cont_a_bp", "cont_b_bp") >= min_bp)
    )


def fingerprint_hamming_pairs(
    df: DataFrame, id_col: str, hex_col: str,
    n_bands: int = 4, hmax: int = 3,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Banded Hamming near-dup pairs over a precomputed 64-bit hex
    fingerprint column (16 hex chars) — perceptual image hashes, frame
    hashes, any 64-bit sketch. The simhash_pairs machinery generalized to
    fingerprints produced UPSTREAM (e.g. image_features.phash), so
    multimodal near-dup composes with the same cap + pigeonhole
    guarantees: 64 bits in 4 bands makes banding exact for hmax <= 3.

    Scale shape: bands are hex substrings (the bucket key is
    (band, 4 hex chars)); the verify joins the (doc, two-int32-halves)
    table and runs one codegen'd xor/popcount per candidate. Splitting
    the 64-bit value into 32-bit halves sidesteps BIGINT sign overflow in
    both engines. Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    width = 16 // n_bands
    base = df.select(F.col(id_col).alias("doc"),
                     F.lower(F.col(hex_col)).alias("fp"))
    sig = base.select(
        "doc",
        F.conv(F.substring("fp", 1, 8), 16, 10)
        .cast("decimal(20,0)").cast("long").alias("hi"),
        F.conv(F.substring("fp", 9, 8), 16, 10)
        .cast("decimal(20,0)").cast("long").alias("lo"),
    )
    bands = base.select(
        "doc",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("fp", 1 + b * width, width).alias("sigb"),
            )
            for b in range(n_bands)
        ])).alias("bs"),
    ).select("doc", F.col("bs.band").alias("band"),
             F.col("bs.sigb").alias("sigb"))
    grouped = bands.groupBy("band", "sigb").agg(
        F.collect_set("doc").alias("docs"))
    pairs = (
        grouped.filter(
            (F.size("docs") > 1) & (F.size("docs") <= max_bucket_size))
        .select(F.explode(_pairs_expr(F.array_sort("docs"))).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    a = sig.select(F.col("doc").alias("doc_a"), F.col("hi").alias("hi_a"),
                   F.col("lo").alias("lo_a"))
    b = sig.select(F.col("doc").alias("doc_b"), F.col("hi").alias("hi_b"),
                   F.col("lo").alias("lo_b"))
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
             + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
            .cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= hmax)
    )


def edit_verify_pairs(df: DataFrame, id_col: str, text_col: str,
                      n_bands: int = 4, shingle_n: int = 3,
                      min_sim_bp: int = 8000, max_chars: int = 4096,
                      max_bucket_size: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Character-level edit-distance verification over LSH candidates —
    the tightest near-dup check in the family: Jaccard over shingles is
    order-blind, but levenshtein certifies the texts really are a few
    edits apart (the OCR-noise / typo-variant case).

    similarity_bp = 10000 - (10000 * lev) div max(len_a, len_b), exact
    integer arithmetic. Texts are truncated to ``max_chars`` first:
    levenshtein is O(la*lb) per pair, so the truncation bounds any single
    comparison at max_chars² cell updates regardless of document size —
    the cap that keeps a 10 MB-page pair from freezing an executor. The
    emitted lengths are the truncated lengths the distance was computed
    over (documented, not silent).

    Scale shape: banding prunes to bucket-local candidates; the verify is
    two doc-keyed hash joins plus one codegen'd JVM levenshtein per
    candidate — no Python, nothing quadratic in the corpus."""
    pairs = lsh_candidate_pairs(df, id_col, text_col, n_bands, shingle_n,
                                max_bucket_size)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.substring(F.col(text_col), 1, max_chars).alias("t"),
    )
    joined = (
        pairs
        .join(base.select(F.col("doc").alias("doc_a"),
                          F.col("t").alias("t_a")), "doc_a")
        .join(base.select(F.col("doc").alias("doc_b"),
                          F.col("t").alias("t_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.levenshtein("t_a", "t_b").cast("bigint").alias("lev"),
            F.length("t_a").cast("bigint").alias("len_a"),
            F.length("t_b").cast("bigint").alias("len_b"),
        )
    )
    sim = F.when(
        F.greatest("len_a", "len_b") > 0,
        F.lit(10000) - F.expr("(10000 * lev) div greatest(len_a, len_b)"),
    ).otherwise(F.lit(10000))
    return (
        joined.withColumn("sim_bp", sim.cast("bigint"))
        .filter(F.col("sim_bp") >= min_sim_bp)
    )


def lsh_recall_eval(df: DataFrame, id_col: str, text_col: str,
                    n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Recall evaluation of the LSH banding against EXACT all-pairs
    Jaccard ground truth — the calibration harness that tells you what
    the banding misses per similarity band before you trust it on a
    corpus. EVAL-ONLY: the truth side is quadratic in the input, so the
    caller passes a bounded SAMPLE (10^2-10^3 docs), never the corpus;
    the candidate side runs the production banding on the same sample.

    Bands are integer basis points ([5000,7000), [7000,9000),
    [9000,10000]); per band: n_truth ground-truth pairs, n_caught by the
    banding, recall_bp = 10000*caught div truth. Banding theory says
    recall rises steeply with similarity — this measures it."""
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            _hashed_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    a = base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    truth = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.when(union > 0, F.expr(
                "(10000 * size(array_intersect(sh_a, sh_b)))"
                " div size(array_union(sh_a, sh_b))"))
            .otherwise(F.lit(0)).cast("bigint").alias("jacc_bp"),
        )
        .filter(F.col("jacc_bp") >= 5000)
    )
    cand = lsh_candidate_pairs(df, id_col, text_col, n_bands, shingle_n) \
        .withColumn("caught", F.lit(1))
    band = (
        F.when(F.col("jacc_bp") < 7000, F.lit("j50_70"))
        .when(F.col("jacc_bp") < 9000, F.lit("j70_90"))
        .otherwise(F.lit("j90_100"))
    )
    return (
        truth.join(cand, ["doc_a", "doc_b"], "left")
        .select(band.alias("band"), F.coalesce("caught", F.lit(0)).alias("c"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"),
             F.sum("c").cast("bigint").alias("n_caught"))
        .select("band", "n_truth", "n_caught",
                F.expr("(10000 * n_caught) div n_truth").cast("bigint")
                .alias("recall_bp"))
    )


def dedup_vs_index(new: DataFrame, index: DataFrame, id_col: str,
                   text_col: str, n_bands: int = 4,
                   shingle_n: int = 3) -> DataFrame:
    """Incremental dedup: admit a fresh crawl batch against the RETAINED
    corpus instead of re-deduping the world — the production shape, where
    yesterday's corpus is already deduplicated and only (new x index)
    collisions matter, never (new x new x old) quadratics.

    The index side is the per-(band, signature) bucket-count table — the
    artifact a curation system persists between crawls (tiny vs the
    corpus: 4 rows of one md5 each per retained doc). Aggregating it
    BEFORE the join leaves exactly one row per signature, so a
    boilerplate signature behind 10^6 retained docs joins as one row
    with n_idx = 10^6 rather than fanning a million rows per new doc —
    the hot-bucket hazard of pairwise LSH never arises on this path.

    Shape: two minhash passes (explode -> codegen md5 -> partial MIN),
    one (band, signature)-keyed hash agg, one (band, signature)-keyed
    join, one doc-keyed agg, one left join back to the batch. Shuffle
    keys are signatures and doc ids, never text.

    Returns (doc, n_bands_hit, n_index_docs, action) for every new doc:
    action = 'drop' when any band signature already exists in the index
    (n_index_docs sums retained-side bucket sizes over hit bands — the
    evidence trail), else 'keep'. Docs under ``shingle_n`` words carry
    no signature and always keep (exact_dedup owns short/empty text).
    """
    idx = build_signature_index(index, id_col, text_col, n_bands, shingle_n)
    return admit_against_index(new, idx, id_col, text_col, n_bands, shingle_n)


def build_signature_index(index: DataFrame, id_col: str, text_col: str,
                          n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """The persistable artifact of incremental dedup: one (band,
    signature, n_idx) row per distinct band signature in the retained
    corpus. A curation system writes this once per crawl cycle and
    admits every subsequent batch against it — the corpus text is never
    re-read. Tiny relative to the corpus (n_bands md5s per doc, fewer
    after aggregation)."""
    return (
        minhash_signatures(index, id_col, text_col, n_bands, shingle_n)
        .groupBy("band", "signature")
        .agg(F.countDistinct("doc").alias("n_idx"))
    )


def admit_against_index(new: DataFrame, idx: DataFrame, id_col: str,
                        text_col: str, n_bands: int = 4,
                        shingle_n: int = 3) -> DataFrame:
    """dedup_vs_index's decision half, taking a prebuilt (possibly
    parquet-loaded) signature index — the per-micro-batch body of
    streaming admission, where the index is built once, not per batch."""
    new_sigs = minhash_signatures(new, id_col, text_col, n_bands, shingle_n)
    hits = (
        new_sigs.join(idx, ["band", "signature"])
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("h"), F.sum("n_idx").alias("nd"))
    )
    return (
        new.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            "doc",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("n_bands_hit"),
            F.coalesce("nd", F.lit(0)).cast("bigint").alias("n_index_docs"),
            F.when(F.col("h").isNotNull(), F.lit("drop"))
            .otherwise(F.lit("keep")).alias("action"),
        )
    )


def dup_rates(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group duplication-rate report: (group, n_docs, n_distinct,
    dup_docs, dup_bp) where dup_bp is the share of docs that are exact
    duplicates of an earlier one, in basis points. This is the crawl-ops
    dashboard number that decides which source/host gets recrawl budget
    cut first — a mirror or a template farm shows up as dup_bp ≈ 10000
    long before any content inspection.

    Scale shape: texts are digested to sha256 in the map stage so the
    distinct-count shuffle carries 32-byte keys, never document bodies
    (distinct-on-digest equals distinct-on-text modulo collisions, the
    same standing assumption as exact_dedup); one (group) hash agg with
    map-side partials is the only shuffle."""
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.sha2(F.col(text_col).cast("string"), 256).alias("d"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("d").cast("bigint").alias("n_distinct"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("dup_docs"),
            F.expr("(n_docs - n_distinct) * 10000 div n_docs")
            .alias("dup_bp"),
        )
    )


def cdc_chunks(df: DataFrame, id_col: str, text_col: str,
               mask: int = 8) -> DataFrame:
    """Content-defined chunking over whitespace words: a chunk boundary
    opens where md5(word) % mask == 0 (and at position 0), so insertions
    shift at most the chunks they touch — the property that makes CDC
    the standard unit for INCREMENTAL corpus dedup (a re-crawled page
    re-shares every untouched chunk, where fixed-size chunks all shift).
    Returns per doc: (doc, n_words, n_chunks, shared_chunks) where
    shared_chunks counts this doc's chunks whose fingerprint also
    appears in at least one OTHER doc.

    Scale shape: explode → one doc-keyed window cumsum for chunk ids →
    (doc, chunk) agg building order-exact fingerprints (array_sort on
    (pos, word) structs — collect_list alone has no order guarantee) →
    one fingerprint-keyed agg for document frequency → a fingerprint
    join back. All shuffles are keyed; the fingerprint carries 32 hex
    chars, never chunk text."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc").orderBy("pos")
    words = (
        df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
        .withColumn(
            "b",
            ((F.col("pos") == 0)
             | (F.conv(F.substring(F.md5("w"), 1, 15), 16, 10)
                .cast("bigint") % mask == 0)).cast("int"),
        )
        .withColumn("chunk", F.sum("b").over(w))
    )
    chunks = (
        words.groupBy("doc", "chunk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.md5(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"]),
                " ")).alias("fp"),
        )
    )
    docfreq = chunks.groupBy("fp").agg(
        F.countDistinct("doc").alias("ndocs"))
    return (
        chunks.join(docfreq, "fp")
        .groupBy("doc")
        .agg(
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint").alias("shared_chunks"),
        )
        .select(F.col("doc").alias(id_col), "n_words", "n_chunks",
                "shared_chunks")
    )
