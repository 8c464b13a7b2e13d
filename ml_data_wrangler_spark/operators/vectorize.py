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
