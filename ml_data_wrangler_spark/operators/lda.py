"""LDA topic modeling (SURVEY.md §2.7 M1-M5) on MLlib.

Reference mapping (LDA_logic.py):
  * LdaMulticore(corpus, id2word, iterations, num_topics, workers,
    passes, random_state) → pyspark.ml.clustering.LDA(k, maxIter,
    seed, optimizer="online"). ``workers`` has no analog (parallelism =
    partitions); ``passes`` folds into maxIter (SURVEY.md §7.4.5).
  * random_state per train (LDA_logic.py:59-67) → explicit ``seed``
    parameter (reproducibility, SURVEY.md §7.4.1).
  * coherence sweep k=1..19 (LDA_logic.py:317-357) → lda_sweep over an
    explicit k range; coherence = UMass computed EXACTLY from
    document co-occurrence counts as a DataFrame job (gensim c_v has
    no Spark built-in; UMass is the exact-from-counts variant —
    SURVEY.md §7.4.2).
  * input validation (LDA_logic.py:145-168) → validate_lda_params with
    the same bounds (passes < 20, iterations < 200).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_lda_params(num_topics: int, iterations: int, passes: int) -> None:
    """F3 — same bounds as the reference (LDA_logic.py:145-168)."""
    for name, v in (("num_topics", num_topics), ("iterations", iterations), ("passes", passes)):
        if not isinstance(v, int) or v < 1:
            raise ValueError(f"{name} must be a positive integer, got {v!r}")
    if passes >= 20:
        raise ValueError("passes must be < 20")
    if iterations >= 200:
        raise ValueError("iterations must be < 200")


def fit_lda(bow_df: DataFrame, k: int, max_iter: int = 20, seed: int = 42,
            features_col: str = "bow"):
    """M1 — train one LDA model (online optimizer: streaming-friendly,
    scales over partitions; the distributed analog of LdaMulticore)."""
    from pyspark.ml.clustering import LDA

    lda = LDA(k=k, maxIter=max_iter, seed=seed, featuresCol=features_col,
              optimizer="online")
    return lda.fit(bow_df)


def topics_df(model, vocabulary: list[str], n_terms: int = 5) -> DataFrame:
    """M4-ish — describeTopics with term strings resolved from the
    vocabulary; returns DataFrame[topic, term, weight]."""
    spark = model.describeTopics(n_terms).sparkSession
    vocab_arr = F.array(*[F.lit(w) for w in vocabulary])
    return (
        model.describeTopics(n_terms)
        .select(
            "topic",
            F.explode(
                F.arrays_zip(
                    F.col("termIndices").alias("idx"),
                    F.col("termWeights").alias("w"),
                )
            ).alias("tw"),
        )
        .select(
            F.col("topic").cast("long").alias("topic"),
            F.element_at(vocab_arr, F.col("tw.idx") + 1).alias("term"),
            F.round(F.col("tw.w"), 6).alias("weight"),
        )
    )


def topic_term_distribution(model) -> list[list[float]]:
    """Topic-term distributions, one list per topic, each summing to 1.

    MLlib's online-optimizer ``topicsMatrix`` holds UNNORMALIZED
    variational counts (lambda); this normalizes each topic column into
    the probability distribution the reference's gensim
    ``show_topics`` exposes (LDA_logic.py:124-134). Driver-side on a
    vocabSize × k matrix — tiny by construction (vocab ≤ 5000).
    """
    mat = model.topicsMatrix()
    k = mat.numCols
    v = mat.numRows
    out = []
    for j in range(k):
        col = [mat[i, j] for i in range(v)]
        s = sum(col) or 1.0
        out.append([x / s for x in col])
    return out


def umass_coherence(tokens: DataFrame, topic_terms: list[list[str]], eps: float = 1.0) -> list[float]:
    """UMass coherence per topic, exact from corpus counts.

    C(t) = Σ_{m=2..M} Σ_{l=1..m-1} log((D(w_m, w_l) + eps) / D(w_l))

    D(·) document frequencies come from ONE distributed job over the
    distinct (doc, token) pairs restricted to the union of topic terms
    (a tiny broadcast set); pair counts via a self-join blocked on
    doc_id. Only the final O(topics × M²) arithmetic is driver-side.
    """
    all_terms = sorted({w for terms in topic_terms for w in terms})
    if not all_terms:
        return [0.0 for _ in topic_terms]
    dt = (
        tokens.select("doc_id", F.explode("tokens").alias("token"))
        .where(F.col("token").isin(all_terms))
        .distinct()
    )
    dt.cache()
    single = {r["token"]: r["df"] for r in dt.groupBy("token").agg(F.count("*").alias("df")).collect()}
    a, b = dt.alias("a"), dt.alias("b")
    pair_rows = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.token") < F.col("b.token")))
        .groupBy(F.col("a.token").alias("w1"), F.col("b.token").alias("w2"))
        .agg(F.count("*").alias("df"))
        .collect()
    )
    dt.unpersist()
    pair = {(r["w1"], r["w2"]): r["df"] for r in pair_rows}

    def d2(x: str, y: str) -> int:
        return pair.get((x, y) if x < y else (y, x), 0)

    scores = []
    for terms in topic_terms:
        s = 0.0
        for m in range(1, len(terms)):
            for l in range(m):
                wl, wm = terms[l], terms[m]
                if single.get(wl, 0) > 0:
                    s += math.log((d2(wm, wl) + eps) / single[wl])
        scores.append(s)
    return scores


def cv_coherence(
    tokens: DataFrame,
    topic_terms: list[list[str]],
    window_size: int = 110,
    eps: float = 1e-12,
) -> list[float]:
    """C_v coherence (Röder/Both/Hinneburg 2015) per topic, computed
    as a DataFrame job.

    Pipeline (matches gensim's c_v construction):
      1. boolean sliding windows of ``window_size`` over each doc's
         token sequence (step 1; short docs yield one window);
      2. window-occurrence probabilities P(w), P(wi,wj) over ALL
         windows, restricted to the union of topic terms;
      3. NPMI(wi,wj) = ln(P(ij)/(P(i)P(j))) / -ln(P(ij));
      4. per term the NPMI vector against the topic's terms; topic
         score = mean cosine(v_i, Σ_j v_j).

    Steps 1-2 are distributed (explode windows → distinct
    (window, term) pairs → count + blocked self-join); 3-4 are
    driver-side on an O(topics × N²) table. The window explode is the
    scale knob: work is O(total_tokens × |terms ∩ window|), never
    pairwise over documents.
    """
    all_terms = sorted({w for terms in topic_terms for w in terms})
    if not all_terms:
        return [0.0 for _ in topic_terms]

    toks = tokens.select("doc_id", F.col("tokens"))
    n = F.size("tokens")
    starts = F.sequence(
        F.lit(0), F.greatest(n - window_size, F.lit(0))
    )  # gensim: max(n - s + 1, 1) windows, 1-token step
    win = toks.select(
        "doc_id",
        F.posexplode(starts).alias("w_idx", "start"),
        F.col("tokens"),
    ).select(
        F.concat_ws("_", "doc_id", "w_idx").alias("window_id"),
        F.array_distinct(
            F.array_intersect(
                F.slice(F.col("tokens"), F.col("start") + 1, window_size),
                F.array(*[F.lit(t) for t in all_terms]),
            )
        ).alias("terms"),
    )
    win.cache()
    total_windows = win.count()
    wt = win.select("window_id", F.explode("terms").alias("term"))
    wt.cache()
    single = {
        r["term"]: r["nw"]
        for r in wt.groupBy("term").agg(F.count("*").alias("nw")).collect()
    }
    a, b = wt.alias("a"), wt.alias("b")
    pair_rows = (
        a.join(
            b,
            (F.col("a.window_id") == F.col("b.window_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(F.col("a.term").alias("w1"), F.col("b.term").alias("w2"))
        .agg(F.count("*").alias("nw"))
        .collect()
    )
    wt.unpersist()
    win.unpersist()
    pair = {(r["w1"], r["w2"]): r["nw"] for r in pair_rows}

    def p(w: str) -> float:
        return single.get(w, 0) / total_windows

    def p2(x: str, y: str) -> float:
        key = (x, y) if x < y else (y, x)
        return pair.get(key, 0) / total_windows

    def npmi(x: str, y: str) -> float:
        if x == y:
            return 1.0
        pij = p2(x, y)
        pi, pj = p(x), p(y)
        if pij <= 0 or pi <= 0 or pj <= 0:
            return 0.0
        return math.log(pij / (pi * pj) + eps) / -math.log(pij + eps)

    def cosine(u: list[float], v: list[float]) -> float:
        dot = sum(a_ * b_ for a_, b_ in zip(u, v))
        nu = math.sqrt(sum(a_ * a_ for a_ in u))
        nv = math.sqrt(sum(b_ * b_ for b_ in v))
        return dot / (nu * nv) if nu > 0 and nv > 0 else 0.0

    scores = []
    for terms in topic_terms:
        vecs = [[npmi(wi, wj) for wj in terms] for wi in terms]
        topic_vec = [sum(col) for col in zip(*vecs)]
        sims = [cosine(v, topic_vec) for v in vecs]
        scores.append(sum(sims) / len(sims) if sims else 0.0)
    return scores


def lda_sweep(
    bow_df: DataFrame,
    tokens: DataFrame,
    vocabulary: list[str],
    k_values: range,
    max_iter: int = 10,
    seed: int = 42,
    n_terms: int = 10,
    coherence: str = "umass",
) -> DataFrame:
    """M3 — the coherence sweep: train LDA per k (driver loop, each fit
    a distributed job), score coherence of the top-``n_terms`` terms,
    return DataFrame[k, coherence]. The reference swept k=1..19 with
    gensim c_v and a fresh random seed per run (LDA_logic.py:338-349,
    59-67); here the seed is pinned, the k range is explicit, and
    ``coherence`` picks "umass" (exact from doc co-occurrence counts)
    or "c_v" (sliding-window NPMI — the reference's measure)."""
    if coherence not in ("umass", "c_v"):
        raise ValueError(f"coherence must be 'umass' or 'c_v', got {coherence!r}")
    from concurrent.futures import ThreadPoolExecutor

    from ml_data_wrangler_spark.operators.fitting import widen_for_fit

    spark = bow_df.sparkSession
    ks = list(k_values)
    # Online-LDA iterations run one task per bow partition; a 1-split
    # bow pins every concurrent fit single-task (fitting.py).
    bow_df = widen_for_fit(bow_df, concurrent_fits=min(4, max(1, len(ks))))
    bow_df.cache()

    # Sweep members are INDEPENDENT models — fit them concurrently.
    # Spark schedules jobs from multiple driver threads fine; each fit
    # is a small distributed job whose scheduling latency (not compute)
    # dominates a serial sweep. Same per-k seeds → identical results to
    # the sequential loop.
    def fit_one(k: int) -> tuple[int, list[list[str]]]:
        model = fit_lda(bow_df, k=k, max_iter=max_iter, seed=seed)
        desc = model.describeTopics(n_terms).collect()
        return k, [[vocabulary[i] for i in r["termIndices"]] for r in desc]

    with ThreadPoolExecutor(max_workers=min(4, max(1, len(ks)))) as pool:
        fitted = list(pool.map(fit_one, ks))
    bow_df.unpersist()

    if coherence == "umass":
        # ONE co-occurrence pass over the union of every k's topic
        # terms, then each k scores from the shared count maps —
        # 2 distributed jobs total instead of 2 per k.
        all_terms = [terms for _, topic_terms in fitted for terms in topic_terms]
        scores = umass_coherence(tokens, all_terms)
        rows = []
        i = 0
        for k, topic_terms in fitted:
            coh = scores[i : i + len(topic_terms)]
            i += len(topic_terms)
            rows.append((k, round(sum(coh) / len(coh) if coh else 0.0, 6)))
    else:
        rows = []
        for k, topic_terms in fitted:
            coh = cv_coherence(tokens, topic_terms)
            rows.append((k, round(sum(coh) / len(coh) if coh else 0.0, 6)))
    return spark.createDataFrame(rows, schema="k bigint, coherence double")


def top_5_topics(model, vocabulary: list[str], n_terms: int = 5) -> DataFrame:
    """M4 — first five topics (get_top_5_topic, LDA_logic.py:124-134)."""
    return topics_df(model, vocabulary, n_terms).where(F.col("topic") < 5)
