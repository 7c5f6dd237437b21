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
