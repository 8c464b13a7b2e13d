"""ml_data_wrangler_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-wrangling and
topic-modeling capabilities of the reference repo
(Terry-BrooksJr/ML-Data-Wrangler, surveyed in SURVEY.md), extended with
the relational/OLAP core Spark provides and the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) that a 100 TB corpus pipeline needs.

Design rules (see SURVEY.md §4/§7):
  * DataFrame/SQL first — declare the logical plan, let Catalyst +
    Tungsten pick the physical strategy.
  * UDFs only where built-ins genuinely can't express the semantics
    (NFKC+HTML-unescape normalization, spaCy-style lemmatization);
    always Arrow-batched pandas UDFs, never row-at-a-time.
  * Explicit schemas on every read; no inference in the engine.
  * Determinism: surrogate ids via xxhash64, seeds and run dates are
    parameters (reference used random.randint / datetime.now —
    SURVEY.md §7.4.1).
"""

__version__ = "0.1.0"

from ml_data_wrangler_spark.session import get_spark  # noqa: F401
