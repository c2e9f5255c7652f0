"""Small shared operator utilities."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical operators whose physical plan contains an Exchange. With AQE
# enabled, touching .rdd on a plan that contains exchanges materializes
# the upstream query stages EAGERLY, and the real action then recomputes
# them — a silent double execution. The probe below therefore only runs
# on shuffle-free plans (scan / project / filter chains), where .rdd is
# a lazy wrapper and costs nothing.
#
# Node names are matched at TREE-NODE position (start of a plan line,
# after the ":  +- " indent art) — a bare substring test false-positived
# on column/relation names like `JoinDate` or a view called `SortedDocs`
# and silently skipped the widen (r12 ADVICE).
_SHUFFLE_NODE_RE = re.compile(
    r"(?m)^[\s:+\-]*(?:"
    r"Join|Aggregate|Window|Sort|Repartition|RepartitionByExpression|"
    r"Deduplicate|Intersect|Except|CoGroup|GlobalLimit"
    r")\b"
)


def widen_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition an input whose scan has fewer partitions
    than the cluster's default parallelism.

    A corpus narrower than the cluster (fewer scan splits than cores —
    by definition a small corpus, each split ≤ maxPartitionBytes)
    serializes every Arrow pass onto one core; one cheap shuffle unlocks
    them all. At scale scan partitions >> parallelism and this is a
    no-op.

    The partition-count probe is gated to shuffle-free logical plans:
    if the input already contains a join/aggregate/repartition, the
    probe is skipped entirely (its shuffle already spread the data to
    ``spark.sql.shuffle.partitions``, and probing via ``.rdd`` under AQE
    would eagerly materialize the upstream stages — double execution).
    Streaming inputs pass through untouched — their parallelism comes
    from the source."""
    try:
        if df.isStreaming:
            return df
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if _SHUFFLE_NODE_RE.search(plan):
            return df
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:  # noqa: BLE001 - exotic plans: pass through
        pass
    return df
