"""Regression tests for the round-7 ADVICE findings (fixed in round 8):

1. snapshots._merged_schema_ddl must survive comma-bearing column types
   (decimal(18,6), map<string,int>, nested struct).
2. multimodal.decode_image must normalize struct.error / zlib.error from
   the stdlib PNG codec to its documented ValueError contract so
   executor-side fallbacks catch malformed payloads.
3. retrieval.boolean_search must reject pure-negation clauses instead of
   silently matching zero documents.
4. spans.winnowing_fingerprints' composite key guards pos < 2^20.
5. sampling.negative_sampling raises clearly on an empty corpus and on
   cumulative weight >= 2^47.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from m13_sparkstreaming_python_azure_spark.operators import multimodal
from m13_sparkstreaming_python_azure_spark.operators import png as pnglib
from m13_sparkstreaming_python_azure_spark.operators.retrieval import (
    boolean_search,
)
from m13_sparkstreaming_python_azure_spark.operators.sampling import (
    negative_sampling,
)
from m13_sparkstreaming_python_azure_spark.sources.snapshots import (
    _merged_schema_ddl,
    _split_top_level,
)


# ---------------------------------------------------------------------------
# 1. schema-DDL merge with comma-bearing types
# ---------------------------------------------------------------------------


def test_split_top_level_nested_types():
    inner = (
        "a:bigint,b:decimal(18,6),c:map<string,int>,"
        "d:struct<x:decimal(10,2),y:array<map<string,bigint>>>,e:string"
    )
    parts = _split_top_level(inner)
    assert parts == [
        "a:bigint",
        "b:decimal(18,6)",
        "c:map<string,int>",
        "d:struct<x:decimal(10,2),y:array<map<string,bigint>>>",
        "e:string",
    ]
    assert _split_top_level("") == []


def test_merged_schema_ddl_decimal_and_map(spark):
    import pyspark.sql.functions as F

    prev = "struct<k:bigint,amount:decimal(18,6),tags:map<string,int>>"
    df = spark.range(1).select(
        F.col("id").alias("k"),
        F.lit("x").alias("note"),
    )
    merged = _merged_schema_ddl(prev, df)
    # previous columns keep order and exact types; new column appended
    assert merged == (
        "struct<k:bigint,amount:decimal(18,6),"
        "tags:map<string,int>,note:string>"
    )


def test_merged_schema_ddl_idempotent_on_same_schema(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        F.col("id").alias("k"),
        F.lit(1.5).cast("decimal(18,6)").alias("amount"),
    )
    ddl = df.schema.simpleString()
    assert _merged_schema_ddl(ddl, df) == ddl


# ---------------------------------------------------------------------------
# 2. malformed PNG payloads decode-fail as ValueError, never struct/zlib
# ---------------------------------------------------------------------------


def _valid_png() -> bytes:
    import numpy as np

    px = np.zeros((4, 4, 3), dtype="uint8")
    px[1, 2] = (10, 200, 30)
    return pnglib.encode_png(px)


@pytest.mark.skipif(multimodal.PIL_AVAILABLE, reason="stdlib path only")
def test_truncated_png_chunk_raises_valueerror():
    payload = _valid_png()[:20]  # signature intact, IHDR chunk truncated
    with pytest.raises(ValueError, match="undecodable"):
        multimodal.decode_image(payload, "png")


@pytest.mark.skipif(multimodal.PIL_AVAILABLE, reason="stdlib path only")
def test_corrupt_idat_raises_valueerror():
    payload = bytearray(_valid_png())
    # find the IDAT chunk and corrupt its compressed body, then re-stamp
    # the CRC so the corruption reaches zlib (not the CRC check)
    i = payload.find(b"IDAT")
    length = int.from_bytes(payload[i - 4 : i], "big")
    body_start = i + 4
    payload[body_start] ^= 0xFF  # destroy the zlib header byte
    crc = zlib.crc32(bytes(payload[i : body_start + length])) & 0xFFFFFFFF
    payload[body_start + length : body_start + length + 4] = struct.pack(
        ">I", crc
    )
    with pytest.raises(ValueError, match="undecodable"):
        multimodal.decode_image(bytes(payload), "png")


def test_valid_png_still_decodes():
    px = multimodal.decode_image(_valid_png(), "png")
    assert px.shape == (4, 4, 3)
    assert tuple(px[1, 2]) == (10, 200, 30)


# ---------------------------------------------------------------------------
# 3. boolean_search rejects pure-negation clauses
# ---------------------------------------------------------------------------


def test_boolean_search_pure_negation_rejected(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "spam only")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="no positive"):
        boolean_search(docs, [{"none": ["spam"]}])
    # mixed clause list: the bad clause is named by index
    with pytest.raises(ValueError, match="clause 1"):
        boolean_search(
            docs, [{"all": ["alpha"]}, {"all": [], "none": ["spam"]}]
        )


def test_boolean_search_positive_clause_still_works(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "spam only"), (3, "alpha spam")],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["clause"])
        for r in boolean_search(
            docs, [{"all": ["alpha"], "none": ["spam"]}]
        ).collect()
    }
    assert got == {(1, 0)}


# ---------------------------------------------------------------------------
# 5. negative_sampling input validation
# ---------------------------------------------------------------------------


def test_negative_sampling_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        negative_sampling(empty, n_samples=10)


def test_negative_sampling_normal_path(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], ["doc_id", "text"]
    )
    out = negative_sampling(docs, n_samples=64)
    draws = {r["token"]: r["n_draws"] for r in out.collect()}
    assert sum(draws.values()) == 64
    assert set(draws) <= {"a", "b", "c"}
