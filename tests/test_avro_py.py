"""sources/avro_py — the pure-Python Avro Object Container File codec
(the connector-less Avro path, VERDICT r9 #7).

Wire-format pins are hand-computed from the PUBLIC Avro 1.x spec
(https://avro.apache.org/docs/1.11.1/specification/): zigzag-varint
longs, little-endian IEEE floats, length-prefixed utf8/bytes, union =
branch index + value, OCF = magic + metadata map + sync + blocks.
Hand-pinning keeps the test non-circular (it would pass/fail against
any conforming implementation, not just ours)."""

from __future__ import annotations

import io
import struct

import pytest
from pyspark.sql import functions as F

from m13_sparkstreaming_python_azure_spark.sources.avro_py import (
    _r_long,
    _w_long,
    decode_file,
    encode_file,
    read_avro_py,
    spark_to_avro_schema,
    write_avro_py,
)


# spec §Binary Encoding: zigzag examples (0→00, -1→01, 1→02, -2→03, 2→04)
@pytest.mark.parametrize(
    "value,wire",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (8192, b"\x80\x80\x01"),
    ],
)
def test_zigzag_varint_wire_bytes(value, wire):
    out = io.BytesIO()
    _w_long(out, value)
    assert out.getvalue() == wire
    got, pos = _r_long(memoryview(wire), 0)
    assert (got, pos) == (value, len(wire))


def test_hand_built_container_decodes():
    """Build an OCF byte-by-byte from the spec (codec null, one block,
    record {id: long, name: ["null","string"]}) and decode it."""
    schema = (
        b'{"type":"record","name":"r","fields":['
        b'{"name":"id","type":"long"},'
        b'{"name":"name","type":["null","string"]}]}'
    )
    sync = bytes(range(16))
    body = io.BytesIO()
    # row 1: id=1 (zigzag 02), name=branch 1 (02) + "ab" (len 04, bytes)
    body.write(b"\x02" + b"\x02" + b"\x04ab")
    # row 2: id=-2 (03), name=null (branch 0 → 00)
    body.write(b"\x03" + b"\x00")
    payload = body.getvalue()
    ocf = io.BytesIO()
    ocf.write(b"Obj\x01")
    # metadata map: 2 entries
    ocf.write(b"\x04")
    for k, v in ((b"avro.schema", schema), (b"avro.codec", b"null")):
        _w_long(ocf, len(k))
        ocf.write(k)
        _w_long(ocf, len(v))
        ocf.write(v)
    ocf.write(b"\x00")
    ocf.write(sync)
    _w_long(ocf, 2)  # block row count
    _w_long(ocf, len(payload))
    ocf.write(payload)
    ocf.write(sync)
    got_schema, rows = decode_file(ocf.getvalue())
    assert [f["name"] for f in got_schema["fields"]] == ["id", "name"]
    assert rows == [{"id": 1, "name": "ab"}, {"id": -2, "name": None}]


def test_encode_decode_roundtrip_with_deflate():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "x", "type": ["null", "double"]},
            {"name": "s", "type": "string"},
            {"name": "v", "type": {"type": "array", "items": "float"}},
        ],
    }
    rows = [
        {"k": i, "x": None if i % 3 == 0 else i / 7, "s": f"s{i}",
         "v": [float(i), float(i) + 0.5]}
        for i in range(500)
    ]
    data = encode_file(schema, rows, codec="deflate", block_rows=128)
    got_schema, got = decode_file(data)
    assert got_schema == schema
    assert len(got) == 500
    assert got[1]["x"] == pytest.approx(1 / 7)
    assert got[0]["x"] is None
    assert got[499]["v"] == [
        struct.unpack("<f", struct.pack("<f", 499.0))[0],
        struct.unpack("<f", struct.pack("<f", 499.5))[0],
    ]


def test_spark_roundtrip_types_and_values(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("d"),
        F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("n"), F.col("id"))
        ).alias("s"),
        F.to_timestamp(F.lit("2021-03-04 05:06:07.123456")).alias("ts"),
        F.array(F.col("id").cast("float"), F.lit(0.25).cast("float")).alias(
            "vec"
        ),
        (F.col("id") % 2 == 0).alias("b"),
    )
    path = str(tmp_path / "avro_rt")
    write_avro_py(df, path)
    back = read_avro_py(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    a = sorted(map(str, df.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_schema_translation_nullable_unions(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    )
    avro = spark_to_avro_schema(df.schema)
    # spark.range → k non-nullable long; lit → s non-nullable string
    by_name = {f["name"]: f["type"] for f in avro["fields"]}
    assert by_name["k"] in ("long", ["null", "long"])
    assert "string" in (
        by_name["s"] if isinstance(by_name["s"], list) else [by_name["s"]]
    )


def test_spark_roundtrip_nulls_in_every_type(spark, tmp_path):
    """ADVICE r10 (high): pandas batches deliver NaN/NaT for nulls, so a
    null in a nullable long crashed the writer, a null timestamp encoded
    the NaT sentinel, and a null double was written as a non-null NaN.
    The Arrow write path must round-trip None in EVERY nullable type."""
    df = spark.range(40).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(
            F.col("id") * 10
        ).alias("n"),
        F.when(F.col("id") % 4 == 0, F.lit(None)).otherwise(
            F.col("id") * 0.5
        ).alias("d"),
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(
            F.to_timestamp(F.lit("2021-03-04 05:06:07.123456"))
        ).alias("ts"),
        F.when(F.col("id") % 6 == 0, F.lit(None)).otherwise(
            F.to_date(F.lit("2022-11-30"))
        ).alias("dt"),
        F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(
            F.array(F.col("id"), F.lit(1))
        ).alias("arr"),
    )
    path = str(tmp_path / "avro_nulls")
    write_avro_py(df, path)
    back = read_avro_py(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))
    # the null census per column survives exactly
    for c in ("n", "d", "ts", "dt", "arr"):
        assert (
            back.filter(F.col(c).isNull()).count()
            == df.filter(F.col(c).isNull()).count()
        ), c


def test_spark_roundtrip_keeps_genuine_nan_distinct_from_null(
    spark, tmp_path
):
    """A genuine NaN double is data, not null — the pandas path silently
    collapsed the two; the Arrow path must keep the distinction both
    directions."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 2.5)], "k long, x double"
    )
    path = str(tmp_path / "avro_nan")
    write_avro_py(df, path)
    back = read_avro_py(spark, path)
    rows = {r["k"]: r["x"] for r in back.collect()}
    assert rows[2] is None
    assert rows[3] == 2.5
    assert rows[1] is not None and rows[1] != rows[1]  # NaN stays NaN


def test_write_avro_py_overwrites_previous_parts(spark, tmp_path):
    """ADVICE r10 (medium): the connector path uses mode('overwrite');
    re-running the pure-Python writer must not duplicate data."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    path = str(tmp_path / "avro_ow")
    write_avro_py(df, path)
    write_avro_py(df, path)
    assert read_avro_py(spark, path).count() == 2


def test_write_avro_py_rejects_schemed_paths(spark):
    """ADVICE r11 (low): on a scheme'd path the overwrite glob would
    silently match nothing and a re-run would duplicate data — the
    writer must refuse up front and point at the connector path."""
    import pytest

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="formats.write_avro"):
        write_avro_py(df, "abfss://container@acct.dfs.example/avro_out")
