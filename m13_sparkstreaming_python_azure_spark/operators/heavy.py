"""Heavy hitters: Misra-Gries per-partition sketches + exact verification.

The scale problem: "which items appear more than N/k times" over a
corpus whose distinct-item count dwarfs memory. A naive
groupBy(item).count() shuffles EVERY distinct item; at 100 TB of tokens
that is the dominant shuffle of the whole job, and all but ~k rows of it
are discarded by the final threshold filter.

The classic answer (Misra-Gries '82; mergeability per Agarwal et al.,
PODS'12): each partition maintains k counters in one sequential pass —
increment a tracked item, start tracking if a counter is free, otherwise
decrement ALL counters (conceptually removing k+1 distinct items at
once). Guarantees per partition p: any item with true count > N_p/k is
tracked, and estimates undercount by at most N_p/k. Summing the
per-partition summaries preserves both: every global item with count >
N/k survives into the candidate set (Σ undercounts ≤ Σ N_p/k = N/k).

The candidate set is ~k·partitions rows — broadcastable — so an exact
second pass (semi-join + count restricted to candidates) turns the
sketch into an EXACT threshold answer: deterministic, engine-
independent, hash-gatable. Same sketch-then-verify shape as the LSH
dedup family. Threshold compare stays integer (n·k > N), no float
boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_partial(k: int):
    """mapInPandas kernel: one Misra-Gries pass over the partition's
    batches; emits the k tracked (item, est) pairs at partition end."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf.iloc[:, 0]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = [i for i in counters if counters[i] == 1]
                    for i in counters:
                        counters[i] -= 1
                    for i in dead:
                        del counters[i]
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    return fn


def heavy_hitters_exact(
    df: DataFrame, col: Column | str, k: int = 200
) -> DataFrame:
    """Items whose exact count n satisfies ``n·k > N`` (count > N/k),
    with their EXACT counts — via an MG candidate pass + verification
    pass. Two scans of the input, zero wide shuffles of the distinct-item
    space: the only shuffles are the ~k·partitions candidate summary and
    the candidate-restricted count.

    Output: (item, n) — deterministic regardless of partitioning/order
    (the sketch only affects the candidate superset, never the answer).
    """
    c = F.col(col) if isinstance(col, str) else col
    # NULLs are outside the item universe (the MG kernel and the output
    # both skip them) — drop them BEFORE counting N, or the threshold
    # n·k > N is stricter than documented and can wrongly exclude items
    items = df.select(c.cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cand = (
        items.mapInPandas(_mg_partial(k), "item string, est long")
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
        .select("item")
    )
    total = items.count()
    exact = (
        items.join(F.broadcast(cand), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.filter(F.col("n") * k > F.lit(total)).select("item", "n")
