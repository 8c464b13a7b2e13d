"""Vectorization (SURVEY.md §2.5 A2-A3): tokens → pruned vocabulary →
bag-of-words, via MLlib CountVectorizer.

Parameter mapping to the reference (gensim Dictionary.filter_extremes,
LDA_logic.py:274-277): no_below=5 → minDF=5.0 (absolute), no_above=0.5
→ maxDF=0.5 (fraction), keep_n=5000 → vocabSize=5000. Identical
document-frequency semantics (SURVEY.md §2.5 A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_data_wrangler_spark.functions.text import tokenize


def tokens_df(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens array<string>) via the cheap-path tokenizer."""
    return documents.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("tokens")
    )


def fit_vectorizer(
    tokens: DataFrame,
    min_df: float = 5.0,
    max_df: float = 0.5,
    vocab_size: int = 5000,
):
    """Fit CountVectorizer (A2). Returns the fitted model; its
    .vocabulary is the id↔word map (gensim Dictionary analog)."""
    from pyspark.ml.feature import CountVectorizer

    cv = CountVectorizer(
        inputCol="tokens",
        outputCol="bow",
        minDF=min_df,
        maxDF=max_df,
        vocabSize=vocab_size,
    )
    return cv.fit(tokens)


def vectorize(
    documents: DataFrame,
    min_df: float = 5.0,
    max_df: float = 0.5,
    vocab_size: int = 5000,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """A2+A3: documents → (model, DataFrame[doc_id, tokens, bow]) where
    bow is a SparseVector of term counts (doc2bow analog)."""
    toks = tokens_df(documents, text_col=text_col, id_col=id_col)
    model = fit_vectorizer(toks, min_df=min_df, max_df=max_df, vocab_size=vocab_size)
    return model, model.transform(toks)


def vocabulary_df(documents: DataFrame, min_df: int = 5, max_df: float = 0.5,
                  vocab_size: int = 5000, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The A2 semantics as a pure relational job (oracle-checkable):
    document frequency over distinct (doc, token), pruned by
    [min_df, max_df·N], top vocab_size by (df DESC, token ASC).

    This is the exact declarative dual of CountVectorizer's pruning —
    tests assert the two agree on the kept vocabulary set.
    """
    toks = tokens_df(documents, text_col=text_col, id_col=id_col)
    dt = toks.select("doc_id", F.explode("tokens").alias("token")).distinct()
    dfreq = dt.groupBy("token").agg(F.count("*").alias("df"))
    total = documents.select(F.count("*").alias("n_docs"))
    return (
        dfreq.join(F.broadcast(total))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df * F.col("n_docs")))
        .select("token", "df")
        .orderBy(F.desc("df"), "token")
        .limit(vocab_size)
    )


def tfidf(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int | None = None,
) -> DataFrame:
    """TF-IDF weights as plain relational operations (no MLlib model):
    tf(t,d) = term count in d; idf(t) = ln(N / df(t)); weight rounded
    to 6 decimals.

    Relational on purpose — the weights stay a (doc_id, token, weight)
    TABLE that joins, filters, and aggregates like anything else (and
    is exactly reproducible by any SQL engine), instead of an opaque
    vector column. Physical shape: one explode → per-doc term counts
    (one shuffle), document frequencies from a second aggregation of
    the SAME counts (no re-tokenization), a scalar N, and a BROADCAST
    join of the (vocabulary-sized) df table back onto term counts.

    ``top_n`` keeps each document's top-n weighted terms (rank on the
    ROUNDED weight, token tiebreak — deterministic across engines).

    Returns (doc_id, token, tf, weight[, rank]).
    """
    from pyspark.sql import Window as W

    tok = documents.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = documents.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    weighted = (
        tf.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(df_counts), "token")
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("weight"),
        )
    )
    if top_n is None:
        return weighted
    w = W.partitionBy("doc_id").orderBy(F.desc("weight"), "token")
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
    )
