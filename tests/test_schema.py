"""Schema lattice tests: JSON-intermediate -> StructType conversion,
union collapse rules, pattern-parsed time columns, round-trip."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_gobblin_spark import schema as S


def test_scalars_and_nullable_union():
    js = [
        {"columnName": "id", "dataType": {"type": "long"}, "isNullable": False},
        {"columnName": "name", "dataType": {"type": "string"}},
        {"columnName": "opt", "dataType": {"type": ["string", "null"]}},
        {"columnName": "flag", "dataType": {"type": "boolean"}},
    ]
    st = S.to_struct_type(js)
    assert st["id"].dataType == T.LongType() and not st["id"].nullable
    assert st["opt"].dataType == T.StringType() and st["opt"].nullable
    assert st["flag"].dataType == T.BooleanType()


def test_complex_types_nested():
    js = [
        {"columnName": "tags", "dataType": {"type": "array", "items": "string"}},
        {"columnName": "props", "dataType": {"type": "map", "values": "double"}},
        {
            "columnName": "meta",
            "dataType": {
                "type": "record",
                "fields": [
                    {"columnName": "url", "dataType": {"type": "string"}},
                    {
                        "columnName": "dims",
                        "dataType": {"type": "array", "items": "int"},
                    },
                ],
            },
        },
    ]
    st = S.to_struct_type(js)
    assert st["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert st["props"].dataType == T.MapType(T.StringType(), T.DoubleType(), False)
    meta = st["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert meta["url"].dataType == T.StringType()
    assert meta["dims"].dataType == T.ArrayType(T.IntegerType(), False)


def test_general_union_becomes_member_struct():
    js = [{"columnName": "u", "dataType": {"type": ["string", "long", "null"]}}]
    st = S.to_struct_type(js)
    u = st["u"].dataType
    assert isinstance(u, T.StructType)
    assert [f.name for f in u.fields] == ["member_0", "member_1"]
    assert u["member_0"].dataType == T.StringType()
    assert u["member_1"].dataType == T.LongType()
    assert st["u"].nullable


def test_time_format_parse_columns(spark):
    js = [
        {"columnName": "d", "dataType": {"type": "date", "timeFormat": "yyyyMMdd"}},
        {
            "columnName": "ts",
            "dataType": {"type": "timestamp", "timeFormat": "yyyy-MM-dd HH:mm:ss"},
        },
    ]
    st = S.to_struct_type(js)
    exprs = S.parse_time_columns(st)
    assert set(exprs) == {"d", "ts"}
    df = spark.createDataFrame(
        [("20240115", "2024-01-15 10:30:00")], "d string, ts string"
    )
    out = df.withColumn("d", exprs["d"]).withColumn("ts", exprs["ts"])
    row = out.first()
    assert str(row["d"]) == "2024-01-15"
    assert row["ts"].hour == 10 and row["ts"].minute == 30


def test_round_trip(spark):
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.ArrayType(T.StringType()), True),
            T.StructField(
                "c",
                T.StructType([T.StructField("x", T.DoubleType(), True)]),
                True,
            ),
        ]
    )
    js = S.from_struct_type(st)
    st2 = S.to_struct_type(js)
    assert [f.name for f in st2.fields] == ["a", "b", "c"]
    assert st2["a"].dataType == T.LongType() and not st2["a"].nullable
    assert isinstance(st2["c"].dataType, T.StructType)


def test_schema_drives_json_parse(spark):
    """The declared schema parses a JSON-string stream (the
    JsonStringToJsonIntermediateConverter flow)."""
    js = [
        {"columnName": "k", "dataType": {"type": "int"}},
        {"columnName": "tags", "dataType": {"type": "array", "items": "string"}},
    ]
    st = S.to_struct_type(js)
    df = spark.createDataFrame(
        [('{"k": 5, "tags": ["a", "b"]}',)], "payload string"
    ).withColumn("parsed", F.from_json("payload", st))
    row = df.select("parsed.k", "parsed.tags").first()
    assert row["k"] == 5 and row["tags"] == ["a", "b"]
