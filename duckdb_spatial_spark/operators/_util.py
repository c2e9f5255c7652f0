"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition an input whose scan has fewer partitions
    than the cluster's default parallelism.

    A corpus narrower than the cluster (fewer scan splits than cores —
    by definition a small corpus, each split ≤ maxPartitionBytes)
    serializes every Arrow pass onto one core; one cheap shuffle unlocks
    them all. At scale scan partitions >> parallelism and this is a
    no-op. Streaming inputs (no .rdd) pass through untouched — their
    parallelism comes from the source."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:  # noqa: BLE001 - streaming df has no .rdd
        pass
    return df
