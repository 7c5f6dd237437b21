"""Frequency analytics — exact two-pass heavy hitters and association
rules (market-basket co-occurrence).

The reference has no frequency surface beyond groupBy counts
(stream.ipynb:117-121); these are the corpus-scale versions: the heavy-
hitter pass is how a 100 TB token stream finds its vocabulary head
WITHOUT a full-cardinality shuffle, and association rules are the
classic bounded-basket co-occurrence (explode-within-group, never a
corpus self-join).

Heavy-hitters scale design:
- Pass 1 computes per-partition LOCAL shares in one vectorized
  mapInPandas sweep and keeps items whose local share is >= phi. If an
  item's GLOBAL share is >= phi, then some partition holds it with
  local share >= phi (weighted-mean argument: sum c_p >= phi * sum n_p
  forces c_p/n_p >= phi somewhere) — so the candidate union has NO
  false negatives. At most 1/phi survivors per partition, collected
  and broadcast. (If per-partition vocabulary itself outgrows memory,
  swap the exact local count for Space-Saving at capacity 1/phi —
  identical guarantee, constant memory; the exact count is kept here
  because it is vectorized end-to-end.)
- Pass 2 filters the stream to candidates BEFORE the groupBy, so the
  exact-count shuffle carries only head items, not the tail. Output is
  exactly the items with count >= phi*N — same answer as the full
  groupBy, at a fraction of the shuffle.

Association-rules scale design: baskets are bounded (a training doc has
bounded tags, an order bounded lines), so pairs explode within the
basket array via JVM higher-order functions — per-row quadratic in
basket size only, linear in baskets. No self-join of the item table.
Metrics are ratios of identically-derived BIGINTs — bit-equal across
engines (repo float rule).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _local_candidates(
    batches: Iterator[pd.DataFrame], phi: float
) -> Iterator[pd.DataFrame]:
    """Per-partition candidate pass: exact local counts (vectorized
    value_counts per Arrow batch, merged in a Counter), emit items whose
    local share >= phi. At most floor(1/phi) items can clear a share
    threshold, so the output is bounded regardless of partition size."""
    counts: Counter = Counter()
    n_p = 0
    for pdf in batches:
        n_p += len(pdf)
        counts.update(pdf["item"].value_counts().to_dict())
    keep = [item for item, c in counts.items() if c >= phi * n_p]
    yield pd.DataFrame({"item": keep})


def heavy_hitters(items: DataFrame, col: str, phi: float) -> DataFrame:
    """Exact items with frequency >= phi * N, via candidate generation +
    exact recount (two passes, no full-cardinality shuffle).

    Returns (item, n) — identical to the naive
    ``groupBy(col).count().filter(n >= phi*N)`` by construction; the
    difference is the shuffle carries only candidate rows."""
    stream = items.select(F.col(col).cast("string").alias("item"))
    # candidates stay a DataFrame and prune via broadcast semi-join —
    # NOT a collected isin() list: the bound is partitions × 1/phi,
    # which at cluster scale is broadcast-sized but not literal-sized
    candidates = stream.mapInPandas(
        lambda it: _local_candidates(it, phi), schema="item string"
    ).distinct()
    total = stream.count()
    threshold = phi * total
    return (
        stream.join(F.broadcast(candidates), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(threshold))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int,
) -> DataFrame:
    """Directed association rules over (basket, item) rows.

    For every ordered item pair (antecedent -> consequent) co-occurring
    in >= min_pair_count baskets: support = n_ab/N, confidence =
    n_ab/n_a, lift = confidence/(n_b/N). One groupBy builds the basket
    arrays; pairs explode via array HOFs (no self-join)."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    sets = items.groupBy("b").agg(
        F.array_sort(F.collect_set("item")).alias("arr")
    )
    # ordered pairs (x, y), x != y, from each basket array — JVM-side
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "arr",
                    lambda x: F.transform(
                        F.filter("arr", lambda y: y != x),
                        lambda y: F.struct(
                            x.alias("antecedent"), y.alias("consequent")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.antecedent", "p.consequent")
    pair_counts = (
        pairs.groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    n_baskets = items.select("b").distinct().count()
    # item_counts is tiny (distinct items) — broadcast both lookups
    out = (
        pair_counts.join(
            F.broadcast(
                item_counts.withColumnRenamed("item", "antecedent")
                .withColumnRenamed("n_item", "n_a")
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item_counts.withColumnRenamed("item", "consequent")
                .withColumnRenamed("n_item", "n_b")
            ),
            "consequent",
        )
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_ab",
        (F.col("n_ab") / F.lit(n_baskets)).alias("support"),
        (F.col("n_ab") / F.col("n_a")).alias("confidence"),
        (
            (F.col("n_ab") / F.col("n_a"))
            / (F.col("n_b") / F.lit(n_baskets))
        ).alias("lift"),
    )


def item_cf_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_pair_count: int = 1,
) -> DataFrame:
    """Item-item collaborative filtering over (basket, item) rows: for
    every item, the top-``k`` co-occurrence neighbors by cosine
    similarity cos(i, j) = n_ij / sqrt(n_i · n_j) — the
    "users-also-bought" primitive next to ``association_rules``
    (confidence/lift are directional; cosine is the symmetric
    neighborhood metric an item-based recommender serves).

    Scale shape: pairs are generated WITHIN each basket's item array
    (quadratic in bounded basket size, never an item-table self-join),
    one groupBy counts pairs, item counts broadcast back, one window
    per item ranks the top-k. Same cost profile as association_rules.

    Determinism contract: n_ij, n_i, n_j are exact BIGINTs; the cosine
    divides a BIGINT by the correctly-rounded sqrt of a BIGINT product
    (bit-equal across engines), snaps 1e-6, and ranks on the snapped
    grid with the neighbor id as tiebreak.
    """
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    sets = items.groupBy("b").agg(
        F.array_sort(F.collect_set("item")).alias("arr")
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "arr",
                    lambda x: F.transform(
                        F.filter("arr", lambda y: y != x),
                        lambda y: F.struct(
                            x.alias("item"), y.alias("neighbor")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item", "p.neighbor")
    pair_counts = (
        pairs.groupBy("item", "neighbor")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    joined = pair_counts.join(
        F.broadcast(
            item_counts.withColumnRenamed("n_item", "n_i")
        ),
        "item",
    ).join(
        F.broadcast(
            item_counts.select(
                F.col("item").alias("neighbor"),
                F.col("n_item").alias("n_j"),
            )
        ),
        "neighbor",
    )
    cosine = F.floor(
        F.col("n_ab")
        / F.sqrt((F.col("n_i") * F.col("n_j")).cast("double"))
        * 1e6
        + F.lit(0.5)
    ) / 1e6
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        joined.select("item", "neighbor", "n_ab", cosine.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
