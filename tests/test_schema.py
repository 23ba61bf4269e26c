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


def test_recursive_schema_named_reference_pruned():
    """An Avro-style linked list: Node.next references the enclosing
    record by name. The sanitizer cuts at the re-entry (the
    AvroRecursionEliminatingConverter rule) and reports the path."""
    node = {
        "columnName": "head",
        "dataType": {
            "type": "record",
            "name": "Node",
            "fields": [
                {"columnName": "value", "dataType": "long"},
                {"columnName": "next", "dataType": "Node"},
            ],
        },
    }
    clean, pruned = S.eliminate_recursion([node])
    assert pruned == ["head.next"]
    st = S.to_struct_type(clean)
    assert st["head"].dataType == T.StructType(
        [T.StructField("value", T.LongType(), False)]
    )
    # default mode raises the documented error, naming the path
    try:
        S.to_struct_type([node])
        raise AssertionError("expected SchemaRecursionError")
    except S.SchemaRecursionError as e:
        assert "head.next" in str(e)
    # prune mode converts in one call
    st2 = S.to_struct_type([node], on_recursion="prune")
    assert st2 == st


def test_recursive_schema_object_cycle_and_union():
    """A self-referential Python spec (object cycle) and a union whose
    recursive member must drop while the scalar member survives."""
    rec = {"type": "record", "name": "Tree", "fields": []}
    rec["fields"] = [
        {"columnName": "label", "dataType": "string"},
        {"columnName": "kids", "dataType": {"type": "array", "items": rec}},
        {"columnName": "alt", "dataType": ["null", "long", "Tree"]},
    ]
    clean, pruned = S.eliminate_recursion([{"columnName": "root", "dataType": rec}])
    assert pruned == ["root.kids"]
    st = S.to_struct_type(clean)
    root = st["root"].dataType
    assert [f.name for f in root.fields] == ["label", "alt"]
    # the union kept null+long -> nullable LongType
    assert root["alt"].dataType == T.LongType()


def test_non_recursive_schema_untouched():
    spec = [
        {"columnName": "a", "dataType": "long"},
        {
            "columnName": "b",
            "dataType": {
                "type": "record",
                "name": "Inner",
                "fields": [{"columnName": "x", "dataType": "string"}],
            },
        },
    ]
    clean, pruned = S.eliminate_recursion(spec)
    assert pruned == []
    assert S.to_struct_type(clean) == S.to_struct_type(spec)
