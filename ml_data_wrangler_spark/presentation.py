"""Presentation adapters — the driver-side payloads the reference's
GUI builds for its visualization pane, re-expressed over the engine's
distributed outputs:

  * ``pyldavis_payload`` — the exact kwargs dict of
    ``pyLDAvis.prepare(**payload)`` (reference: app.py:417-451 renders
    the prepared HTML into a QWebEngineView). pyLDAvis itself is NOT a
    dependency of the engine; the adapter emits plain lists so any
    notebook with pyLDAvis installed can render the engine's model.
  * ``coherence_series`` — the (k, coherence) plot series behind the
    reference's coherence chart (app.py:439-441), from ``lda_sweep``'s
    output DataFrame.

These are deliberately driver-side: presentation payloads are
human-scale (k × vocab matrices, one point per swept k). The only
O(corpus) piece — per-document topic mixtures — is capped by
``max_docs`` with a deterministic doc_id order, because no screen
renders a 100 TB corpus' documents anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_data_wrangler_spark.operators.lda import topic_term_distribution


def pyldavis_payload(
    model,
    bow_df: DataFrame,
    vocabulary: list[str],
    id_col: str = "doc_id",
    features_col: str = "bow",
    max_docs: int = 10_000,
) -> dict:
    """Build the ``pyLDAvis.prepare`` kwargs from a fitted MLlib LDA
    model + the bag-of-words DataFrame it was trained on.

    Keys (pyLDAvis' documented interface):
      topic_term_dists  — k × V, rows sum to 1 (normalized from the
                          online optimizer's unnormalized lambda);
      doc_topic_dists   — n × k topic mixtures (first ``max_docs``
                          NON-EMPTY docs in doc_id order — pyLDAvis
                          requires each row to sum to 1, which a
                          zero-length document cannot);
      doc_lengths       — token count per included doc (all > 0);
      vocab             — term strings;
      term_frequency    — corpus-wide count per term (distributed
                          column-sum over the bow vectors).
    """
    from pyspark.ml.functions import vector_to_array

    # Drop empty documents BEFORE the limit so the payload really holds
    # the first ``max_docs`` NON-EMPTY docs (an empty doc inside the
    # first max_docs must not shrink the result). JVM-side predicate —
    # no vectors are collected for rejected rows.
    kept = (
        model.transform(bow_df)
        .where(
            F.exists(
                vector_to_array(F.col(features_col)), lambda x: x != F.lit(0.0)
            )
        )
        .select(id_col, features_col, "topicDistribution")
        .orderBy(id_col)
        .limit(max_docs)
        .collect()
    )
    doc_topic = [list(r["topicDistribution"]) for r in kept]
    doc_lengths = [int(sum(r[features_col].toArray())) for r in kept]

    # distributed column-sum: Summarizer mean × count (both metrics are
    # available on every Spark 3.x) — never collects the bow vectors
    from pyspark.ml.stat import Summarizer

    n_docs = bow_df.count()
    mean_vec = bow_df.select(
        Summarizer.mean(F.col(features_col)).alias("m")
    ).first()["m"]
    term_frequency = [float(x) * n_docs for x in mean_vec.toArray()]

    return {
        "topic_term_dists": topic_term_distribution(model),
        "doc_topic_dists": doc_topic,
        "doc_lengths": doc_lengths,
        "vocab": list(vocabulary),
        "term_frequency": term_frequency,
    }


def coherence_series(sweep_df: DataFrame) -> dict:
    """(k, coherence) plot series from ``lda_sweep`` output, sorted by
    k — the reference's coherence chart data (app.py:439-441)."""
    rows = sweep_df.select("k", "coherence").orderBy("k").collect()
    return {
        "k": [r["k"] for r in rows],
        "coherence": [r["coherence"] for r in rows],
    }
