"""Avro end-to-end: pure-Python OCF codec, native FileFormat scan/write,
cross-path roundtrips, binary-column serde, date-partitioned avro trees,
FileSink avro publish.

Reference surface: AvroHdfsDataWriter (gobblin-core
.../writer/AvroHdfsDataWriter.java:51), AvroToBytesConverter /
BytesToAvroConverter (.../converter/avro/AvroToBytesConverter.java:41),
DatePartitionedAvroFileExtractor
(.../source/extractor/DatePartitionedAvroFileExtractor.java:28).
"""

import json
import os
from datetime import date, datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from incubator_gobblin_spark.formats import avro_ocf as A
from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sinks.files import FileSink, new_run_id
from incubator_gobblin_spark.sources.files import read_date_partitioned

NESTED_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "raw", "type": "bytes"},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "ts",
            "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "n",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
        {"name": "color", "type": {"type": "enum", "name": "c", "symbols": ["RED", "BLUE"]}},
    ],
}

NESTED_RECORDS = [
    {
        "id": 1,
        "name": "alice",
        "score": 1.5,
        "tags": ["a", "b"],
        "props": {"k": 7, "z": None},
        "raw": b"\x00\xff",
        "d": date(2024, 5, 1),
        "ts": datetime(2024, 5, 1, 12, 30, 15, 123456),
        "nested": {"x": 9},
        "color": "RED",
    },
    {
        "id": 2,
        "name": None,
        "score": -0.25,
        "tags": [],
        "props": {},
        "raw": b"",
        "d": date(1969, 12, 31),
        "ts": None,
        "nested": {"x": -1},
        "color": "BLUE",
    },
]


class TestCodec:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_ocf_roundtrip_nested(self, codec):
        data = A.encode_ocf(NESTED_SCHEMA, NESTED_RECORDS, codec=codec)
        schema, records = A.decode_ocf(data)
        assert schema == NESTED_SCHEMA
        assert records == NESTED_RECORDS

    def test_block_splitting(self):
        recs = [{"id": i, "name": None, "score": 0.0, "tags": [], "props": {},
                 "raw": b"", "d": date(2020, 1, 1), "ts": None,
                 "nested": {"x": i}, "color": "RED"} for i in range(10_000)]
        data = A.encode_ocf(NESTED_SCHEMA, recs, block_records=512)
        _, out = A.decode_ocf(data)
        assert out == recs

    def test_single_record_serde(self):
        b = A.encode_record(NESTED_SCHEMA, NESTED_RECORDS[0])
        assert A.decode_record(NESTED_SCHEMA, b) == NESTED_RECORDS[0]

    def test_corrupt_sync_marker_detected(self):
        data = bytearray(A.encode_ocf(NESTED_SCHEMA, NESTED_RECORDS, codec="null"))
        data[-1] ^= 0xFF  # flip a sync byte of the last block
        with pytest.raises(ValueError, match="sync marker"):
            A.decode_ocf(bytes(data))

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.one_of(st.none(), st.text(max_size=40)),
                st.floats(allow_nan=False, width=64),
                st.lists(st.integers(min_value=-1000, max_value=1000), max_size=5),
            ),
            max_size=30,
        )
    )
    def test_property_roundtrip(self, rows):
        schema = {
            "type": "record",
            "name": "p",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
                {"name": "c", "type": "double"},
                {"name": "d", "type": {"type": "array", "items": "int"}},
            ],
        }
        recs = [dict(zip("abcd", r)) for r in rows]
        _, out = A.decode_ocf(A.encode_ocf(schema, recs))
        assert out == recs

    def test_zigzag_varint_edges(self):
        for n in (0, -1, 1, 63, -64, 2**31 - 1, -(2**31), 2**62, -(2**62)):
            buf = bytearray()
            A._write_long(buf, n)
            assert A._Reader(bytes(buf)).read_long() == n


class TestSchemaMapping:
    def test_avro_to_struct_lattice(self):
        st_ = A.avro_to_struct(NESTED_SCHEMA)
        assert st_["id"].dataType.simpleString() == "bigint"
        assert st_["name"].nullable
        assert st_["tags"].dataType.simpleString() == "array<string>"
        assert st_["d"].dataType.simpleString() == "date"
        assert st_["ts"].dataType.simpleString() == "timestamp"
        assert st_["color"].dataType.simpleString() == "string"
        assert st_["nested"].dataType.simpleString() == "struct<x:int>"

    def test_struct_to_avro_nullable_unions(self, spark):
        df = spark.range(1).select(
            F.col("id"),
            F.lit("x").alias("s"),
            F.lit(None).cast("string").alias("maybe"),
        )
        avro = A.struct_to_avro(df.schema, "rec")
        by_name = {f["name"]: f["type"] for f in avro["fields"]}
        assert by_name["id"] == "long"  # spark.range id is non-nullable
        assert by_name["maybe"] == ["null", "string"]


class TestDistributed:
    def test_native_roundtrip(self, spark, sf_dir, tmp_path):
        df = load_table(spark, sf_dir, "orders")
        out = str(tmp_path / "native")
        A.write_avro(df, out)
        back = A.read_avro(spark, out)
        assert back.schema == df.schema
        assert sorted(back.collect()) == sorted(df.collect())

    def test_python_write_native_read(self, spark, sf_dir, tmp_path):
        df = load_table(spark, sf_dir, "region")
        out = str(tmp_path / "pyw")
        n = A.write_avro(df.repartition(2), out, force_python=True)
        assert n == 2
        back = A.read_avro(spark, out)
        assert sorted(back.collect()) == sorted(df.collect())

    def test_native_write_python_read(self, spark, sf_dir, tmp_path):
        df = load_table(spark, sf_dir, "nation")
        out = str(tmp_path / "natw")
        A.write_avro(df, out)
        back = A.read_avro(spark, out, force_python=True)
        assert back.schema == df.schema
        assert sorted(back.collect()) == sorted(df.collect())

    def test_column_serde_roundtrip(self, spark, sf_dir):
        df = load_table(spark, sf_dir, "customer").limit(200)
        sch = A.struct_to_avro(df.select("c_custkey", "c_name").schema, "c")
        rt = (
            df.select(
                A.to_avro_column(F.struct("c_custkey", "c_name"), sch).alias("b"),
                "c_custkey",
                "c_name",
            )
            .select(A.from_avro_column("b", sch).alias("s"), "c_custkey", "c_name")
        )
        bad = rt.filter(
            (F.col("s.c_custkey") != F.col("c_custkey"))
            | (F.col("s.c_name") != F.col("c_name"))
        ).count()
        assert bad == 0
        assert rt.count() == df.count()

    def test_column_serde_accepts_json_string_schema(self, spark):
        df = spark.range(5)
        sch = json.dumps(
            {"type": "record", "name": "r",
             "fields": [{"name": "id", "type": "long"}]}
        )
        rt = df.select(
            A.from_avro_column(A.to_avro_column(F.struct("id"), sch), sch).alias("s")
        ).select("s.id")
        assert sorted(r.id for r in rt.collect()) == [0, 1, 2, 3, 4]


class TestDatePartitionedAvro:
    def test_watermark_pruned_tree(self, spark, sf_dir, tmp_path):
        """DatePartitionedAvroFileExtractor semantics on a real avro
        yyyy/MM/dd tree: low-exclusive / high-inclusive."""
        ev = load_table(spark, sf_dir, "events").withColumn("_d", F.to_date("ts"))
        days = [r["_d"] for r in ev.select("_d").distinct().orderBy("_d").limit(4).collect()]
        root = str(tmp_path / "tree")
        for d in days:
            sub = os.path.join(root, f"{d.year:04d}/{d.month:02d}/{d.day:02d}")
            A.write_avro(ev.filter(F.col("_d") == F.lit(d)).drop("_d"), sub)

        got = read_date_partitioned(
            spark, root, fmt="avro", low=days[0], high=days[2]
        )
        expected = ev.filter((F.col("_d") > F.lit(days[0])) & (F.col("_d") <= F.lit(days[2])))
        assert got.count() == expected.count()
        assert got.select(F.min("_partition_date")).first()[0] == days[1]
        assert got.select(F.max("_partition_date")).first()[0] == days[2]


class TestFileSinkAvro:
    def test_staged_publish_avro(self, spark, sf_dir, tmp_path):
        df = load_table(spark, sf_dir, "supplier")
        out = str(tmp_path / "sink")
        sink = FileSink(path=out, fmt="avro")
        run = new_run_id()
        sink.write_staging(df, run)
        sink.publish(run)
        back = A.read_avro(spark, out)
        assert back.count() == df.count()
        assert not os.path.exists(os.path.join(out, "_staging", run))
