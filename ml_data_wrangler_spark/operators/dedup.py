"""Deduplication operators (north-star extensions, BASELINE.json).

Four tiers, cheapest-first — at 100 TB you run them in this order and
each tier only sees what the previous one couldn't resolve:

  1. exact        — md5/xxhash64 fingerprint groupBy (one shuffle);
  2. SimHash      — one 32/64-bit signature per doc, bucket collisions
                    are candidates (one shuffle, constant state);
  3. MinHash+LSH  — banded signature join for Jaccard-similar pairs
                    (shuffle on band-bucket keys, posting lists bounded
                    by band width);
  4. exact Jaccard — inverted shingle index self-join; exact but the
                    most expensive; used to verify candidates from 2/3.

All token/shingle work is JVM-side array expressions; MinHash uses
MLlib's MinHashLSH (seeded, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_data_wrangler_spark.functions.text import tokenize


def shingle_index(documents: DataFrame, k: int = 3) -> DataFrame:
    """Inverted index: one row per distinct (doc_id, shingle). Docs
    shorter than k tokens produce no rows (nothing to compare)."""
    toks = tokenize(F.col("text"))
    return (
        documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= k)
        .select("doc_id", F.explode(_shingles_from_tokens(F.col("toks"), k)).alias("shingle"))
        .distinct()
    )


def _shingles_from_tokens(toks, k: int):
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via the inverted shingle
    index: join on shingle → shared counts → |A∪B| from per-doc sizes.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard ≥ threshold (threshold applied before rounding).
    """
    sh = shingle_index(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # Length-ratio prune (lossless): J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|),
    # so pairs whose set sizes differ by more than the threshold ratio
    # can never qualify — attach sizes to the posting lists (broadcast)
    # and drop those pairs BEFORE the pair-count aggregation. At scale
    # this is the difference between aggregating all co-bucketed pairs
    # and only the plausibly-similar ones.
    sh_n = sh.join(F.broadcast(sizes), "doc_id")
    a = sh_n.alias("a")
    b = sh_n.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n"))
                >= threshold * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("shared")
    )
    # sizes is one row per doc — broadcast both lookups so the pair
    # stream never shuffles again after the shingle-join aggregation
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_near_dup_pairs(
    documents: DataFrame,
    k: int = 3,
    jaccard_threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingles → binary feature vectors
    (HashingTF) → MinHashLSH.approxSimilarityJoin.

    Distance column is Jaccard DISTANCE (1 - similarity); we emit
    (doc_a, doc_b, est_jaccard). Deterministic for a fixed seed.
    At scale the banded join keys bound candidate generation — this is
    the structure that replaces qd02's exact index when the corpus no
    longer fits a full self-join.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = tokenize(F.col("text"))
    docs = (
        documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= k)
        .select("doc_id", _shingles_from_tokens(F.col("toks"), k).alias("shingles"))
        .where(F.size("shingles") > 0)
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(docs)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(
        feat, feat, 1.0 - jaccard_threshold, distCol="dist"
    )
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("dist"), 6).alias("est_jaccard"),
        )
    )


def simhash_signatures(documents: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash: per token a stable xxhash64; signature bit b is the
    sign of Σ_tokens (±1 by token-hash bit b). Pure JVM expressions —
    per-doc cost O(tokens × bits), no shuffle, no UDF.

    Returns (doc_id, simhash BIGINT).
    """
    toks = tokenize(F.col("text"))
    hashes = F.transform(toks, lambda tok: F.xxhash64(tok))

    def bit_is_one(b: int):
        # NB: must be a 1-arg lambda — F.filter passes the element
        # index as a second argument, which would shadow a `b=b`
        # keyword default with a Column.
        return lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1

    sig = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.size(F.filter(F.col("hashes"), bit_is_one(b)))
        bit_set = (ones * 2) > F.size(F.col("hashes"))
        sig = sig + F.when(bit_set, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    return (
        documents.select("doc_id", hashes.alias("hashes"))
        .where(F.size("hashes") > 0)
        .select("doc_id", sig.alias("simhash"))
    )


def dedup_keep_min(documents: DataFrame, fingerprint_col) -> DataFrame:
    """Generic exact-dedup: keep the lowest doc_id per fingerprint."""
    return (
        documents.select("doc_id", fingerprint_col.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


def dedup_pipeline(
    documents: DataFrame,
    k: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """The tiered 100 TB dedup flow end-to-end: decide, per document,
    keep or drop.

    1. exact tier: md5-fingerprint groupBy keeps the min doc_id per
       byte-identical group (cheapest; removes the bulk);
    2. candidate tier: exact n-gram Jaccard pairs ≥ threshold over the
       exact-survivors (in production MinHash replaces this index —
       same interface, approximate candidates);
    3. resolution: union-by-min — within each near-dup pair the lower
       doc_id wins; a doc is dropped if ANY kept doc claims it.

    Returns (doc_id, keep boolean, reason string). Deterministic:
    min-id keeper policy at both tiers.
    """
    from ml_data_wrangler_spark.functions.textstats import doc_fingerprint

    fp = documents.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))
    exact_keeper = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    exact = fp.join(exact_keeper, "fp").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).alias("exact_kept")
    )
    survivors = documents.join(
        exact.where(F.col("exact_kept")).select("doc_id"), "doc_id", "left_semi"
    )
    pairs = ngram_jaccard_pairs(survivors, k=k, threshold=jaccard_threshold)
    # one resolution pass: doc_b loses to the (always lower) doc_a.
    # (Min-id policy makes chains converge in one pass: the smallest
    # member of any near-dup cluster keeps, because it never appears
    # as a doc_b.)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        exact.join(losers.withColumn("near_dup", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            (F.col("exact_kept") & F.col("near_dup").isNull()).alias("keep"),
            F.when(~F.col("exact_kept"), "exact_duplicate")
            .when(F.col("near_dup"), "near_duplicate")
            .otherwise("kept")
            .alias("reason"),
        )
    )
