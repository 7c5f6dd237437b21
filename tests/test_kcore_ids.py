"""Tests for k-core peeling (operators/graph.k_core) and stable dense
id assignment (operators/util.stable_ids)."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.operators.graph import k_core
from m13_sparkstreaming_python_azure_spark.operators.util import stable_ids


def _sym(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, ["src", "dst"])


def test_kcore_clique_with_tail(spark):
    # K4 on {1,2,3,4} plus a tail 4-5-6: 3-core = the clique only
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _sym(spark, k4 + [(4, 5), (5, 6)])
    out = {r["node"]: r["degree"] for r in k_core(e, 3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascading_peel(spark):
    # path graph: 2-core empty (peeling cascades from the endpoints in)
    e = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert k_core(e, 2).collect() == []


def test_kcore_cycle_survives_2core(spark):
    e = _sym(spark, [(1, 2), (2, 3), (3, 1)])
    out = {r["node"]: r["degree"] for r in k_core(e, 2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_stable_ids_dense_unique_and_order_preserving(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], ["k", "v"]
    ).repartition(7)
    out = stable_ids(df).collect()
    ids = sorted(r["row_id"] for r in out)
    assert ids == list(range(100))  # dense 0..n-1, no dupes
    assert {(r["k"], r["v"]) for r in out} == {
        (i, f"v{i}") for i in range(100)
    }


def test_stable_ids_empty_and_single_partition(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], ["k"]).coalesce(1)
    out = sorted(
        (r["row_id"], r["k"]) for r in stable_ids(df).collect()
    )
    # single partition: ids follow row order exactly
    assert [i for i, _ in out] == [0, 1, 2]


def test_label_propagation_two_triangles_with_bridge(spark):
    """Known-graph LPA: two triangles joined by one bridge edge settle
    into exactly two communities (each triangle keeps its own min-label
    identity), and the fixed-round output is partition-invariant."""
    from m13_sparkstreaming_python_azure_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        "id_a long, id_b long",
    )
    for parts in (1, 4):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(
                edges.repartition(parts), iterations=5
            ).collect()
        }
        assert {got[0], got[1], got[2]} == {0}
        assert {got[10], got[11], got[12]} == {2}
