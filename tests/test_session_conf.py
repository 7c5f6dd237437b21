"""Session factory and Azure profile conf (SURVEY §2.1 S6)."""

from __future__ import annotations

from m13_sparkstreaming_python_azure_spark.session import azure_oauth_conf


def test_azure_oauth_conf_shape():
    """The reference hard-codes 5 fs.azure.* confs in two places
    (upload.py:37-56, stream.ipynb:55-75); our profile builds the same
    5 keys parameterized — credentials injected by the caller."""
    conf = azure_oauth_conf(
        storage_account="acct",
        client_id="cid",
        client_secret="secret",
        tenant_id="tid",
    )
    suffix = "acct.dfs.core.windows.net"
    assert conf[f"fs.azure.account.auth.type.{suffix}"] == "OAuth"
    assert conf[f"fs.azure.account.oauth2.client.id.{suffix}"] == "cid"
    assert conf[f"fs.azure.account.oauth2.client.secret.{suffix}"] == "secret"
    assert "tid" in conf[f"fs.azure.account.oauth2.client.endpoint.{suffix}"]
    assert (
        conf[f"fs.azure.account.oauth.provider.type.{suffix}"]
        == "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
    )
    assert len(conf) == 5


def test_session_scale_defaults(spark):
    """AQE + Arrow on, UTC session timezone, legacy int96 write mode for
    reference parity (upload.py:33)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (
        spark.conf.get("spark.sql.parquet.int96RebaseModeInWrite") == "LEGACY"
    )


def test_cluster_scale_conf_sizing():
    """Shuffle width derives from input size (~1 task per 128 MB of a
    full-input shuffle) and caps at Spark's practical ceiling."""
    from m13_sparkstreaming_python_azure_spark.session import cluster_scale_conf

    conf = cluster_scale_conf(target_input_tb=100.0)
    assert int(conf["spark.sql.shuffle.partitions"]) == 65536  # capped
    small = cluster_scale_conf(target_input_tb=1.0)
    assert int(small["spark.sql.shuffle.partitions"]) == 8192
    assert small["spark.sql.adaptive.enabled"] == "true"
    assert int(small["spark.sql.files.maxPartitionBytes"]) == 256 * (1 << 20)


def test_runtime_bloom_filter_injected_on_selective_smj(spark, sf_dir):
    """Fact-fact SMJ with a selective filter on one side: the optimizer
    must push a bloom filter of the filtered side's join keys into the
    other side's scan (might_contain in the plan) — at 100 TB this kills
    non-matching lineitem rows before the shuffle."""
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # local fixtures are far below the size thresholds meant for clusters
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_join_strategy_hints_respected(spark, sf_dir):
    """Strategy hints must override the planner's default choice: MERGE →
    SortMergeJoin, SHUFFLE_HASH → ShuffledHashJoin (the escape hatches
    when the optimizer mis-sizes a side at 100 TB)."""
    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    merged = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in plan_of(merged)
    hashed = li.join(
        orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
    )
    assert "ShuffledHashJoin" in plan_of(hashed)


def test_observe_metrics_on_batch_query(spark):
    """DataFrame.observe + Observation: scan-side pipeline metrics (row
    counts, null counts, sums) collected as a side effect of the one real
    action — the monitoring hook for curation pipelines (no second pass
    over the data)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    obs = Observation("ingest_metrics")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("text").isNull()).alias("null_texts"),
        F.sum("n_chars").alias("total_chars"),
    )
    kept = observed.filter(F.col("n_chars") > 0).count()
    metrics = obs.get
    assert metrics["rows_seen"] >= kept
    assert metrics["null_texts"] == 0
    assert metrics["total_chars"] > 0


def test_parameterized_sql(spark):
    """spark.sql named-parameter binding (Spark 4): safe templating for the
    SQL entry point — no string interpolation of user values."""
    from m13_sparkstreaming_python_azure_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001", ("orders",))
    rows = spark.sql(
        "SELECT count(*) AS n FROM orders WHERE o_orderstatus = :status"
        " AND o_totalprice > :floor",
        args={"status": "F", "floor": 0.0},
    ).collect()
    assert rows[0]["n"] > 0


def test_observation_api_collects_metrics_inline(spark, sf_dir):
    """Batch observability (df.observe): metric expressions evaluate
    DURING the action — no second scan — and the result itself is
    untouched. The batch twin of streaming/metrics.py's gauges."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from m13_sparkstreaming_python_azure_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_scan")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
    )
    n = observed.filter(F.col("o_orderstatus") == "F").count()
    got = obs.get
    assert got["rows_scanned"] == orders.count()
    assert got["bad_price"] == 0
    assert 0 < n < got["rows_scanned"]
