"""Partition right-sizing for iterative MLlib fits.

An iterative estimator (KMeans, online LDA, ...) runs one task per
input partition per iteration, so the input's partition count IS its
parallelism. A small parquet table arrives as ONE split — which pins
every iteration of the fit to a single task while the rest of the
cluster idles (observed: KMeans(8) on a 1-split corpus 1.9s vs 0.8s
after widening; an LDA sweep 6.5s vs 4.6s).

``widen_for_fit`` only ever repartitions UP: a corpus that already
scans into many splits (the 100 TB case) keeps its partitioning and
the call is a no-op — no plan change, no exchange. The widening
exchange is round-robin (no keys), so it cannot skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_fit(df: DataFrame, concurrent_fits: int = 1) -> DataFrame:
    """Repartition ``df`` up to the session's parallelism before an
    iterative fit; never down.

    ``concurrent_fits`` divides the target so N models fitted from
    driver threads at once (e.g. a sweep) share the cores instead of
    oversubscribing them N×.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    target = max(1, par // max(1, concurrent_fits))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
