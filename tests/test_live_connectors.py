"""Deploy-time conformance: the SAME planning code the offline suite
proves against the file-backed broker and DuckDB, replayed against REAL
endpoints when the environment provides them — the gap a jar-free
container cannot close (VERDICT: the engine's biggest deploy blind spot).

Run against live infrastructure:

    GOBBLIN_SPARK_LIVE_KAFKA_BOOTSTRAP=broker:9092 \\
        pytest tests/test_live_connectors.py -m live_kafka
    GOBBLIN_SPARK_LIVE_JDBC_URL=jdbc:postgresql://host/db \\
    GOBBLIN_SPARK_LIVE_JDBC_USER=... GOBBLIN_SPARK_LIVE_JDBC_PASSWORD=... \\
        pytest tests/test_live_connectors.py -m live_jdbc

Without the env vars every test SKIPS (visible in --collect-only, never
silently passes). The Spark session additionally needs the connector on
the classpath (spark-sql-kafka / the JDBC driver jar) — provide it via
spark.jars.packages in GOBBLIN_SPARK_LIVE_SPARK_JARS.

What is deliberately NOT re-tested here: planning arithmetic (offset
tiling, predicate rendering, watermark math) — hypothesis and the unit
suite own those. These tests prove the SEAMS: that the exact JSON this
engine hands `startingOffsets`/`endingOffsets` is accepted by the real
connector, that `extract_sql`'s dialect output parses on a real server,
and that `partition_predicates` produce one real source query each.

Reference behavior being conformed to:
- gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:82
  (getWorkunits offset planning against live brokers)
- gobblin-modules/gobblin-sql/.../source/jdbc/JdbcExtractor.java:161
  (getExtractSql executed by a real JDBC connection)
"""

import json
import os
import time
import uuid

import pytest
from pyspark.sql import SparkSession, functions as F

from incubator_gobblin_spark.sources import jdbc as J
from incubator_gobblin_spark.sources import kafka_batch as K
from incubator_gobblin_spark.operators.watermark import WatermarkInterval

KAFKA_BOOTSTRAP = os.environ.get("GOBBLIN_SPARK_LIVE_KAFKA_BOOTSTRAP")
JDBC_URL = os.environ.get("GOBBLIN_SPARK_LIVE_JDBC_URL")
JDBC_PROPS = {
    k: os.environ[e]
    for k, e in (
        ("user", "GOBBLIN_SPARK_LIVE_JDBC_USER"),
        ("password", "GOBBLIN_SPARK_LIVE_JDBC_PASSWORD"),
        ("driver", "GOBBLIN_SPARK_LIVE_JDBC_DRIVER"),
    )
    if e in os.environ
}

live_kafka = pytest.mark.live_kafka
live_jdbc = pytest.mark.live_jdbc

needs_kafka = pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="GOBBLIN_SPARK_LIVE_KAFKA_BOOTSTRAP not set (live broker required)",
)
needs_jdbc = pytest.mark.skipif(
    not JDBC_URL,
    reason="GOBBLIN_SPARK_LIVE_JDBC_URL not set (live server required)",
)


@pytest.fixture(scope="module")
def live_spark():
    """A dedicated session so connector jars don't leak into the offline
    suite's session (and vice versa)."""
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("gobblin-spark-live-conformance")
        .config("spark.sql.shuffle.partitions", "4")
    )
    jars = os.environ.get("GOBBLIN_SPARK_LIVE_SPARK_JARS")
    if jars:
        builder = builder.config("spark.jars.packages", jars)
    s = builder.getOrCreate()
    yield s


def _kafka_admin_offsets(topic):
    """Earliest/latest per partition via kafka-python if present, else
    through the connector itself (startingOffsets=earliest metadata)."""
    try:
        from kafka import KafkaConsumer, TopicPartition  # type: ignore
    except ImportError:
        pytest.skip("kafka-python not installed for admin offset probe")
    c = KafkaConsumer(bootstrap_servers=KAFKA_BOOTSTRAP)
    parts = sorted(c.partitions_for_topic(topic) or [])
    if not parts:
        pytest.skip(f"topic {topic} has no partitions visible")
    tps = [TopicPartition(topic, p) for p in parts]
    earliest = {tp.partition: o for tp, o in c.beginning_offsets(tps).items()}
    latest = {tp.partition: o for tp, o in c.end_offsets(tps).items()}
    c.close()
    return earliest, latest


@live_kafka
@needs_kafka
def test_live_kafka_planned_ranges_read_exactly(live_spark):
    """plan_offsets → offsets_json → read_kafka_batch(format='kafka')
    against the real broker: the bounded read returns EXACTLY the
    planned [start, end) rows per partition, and a second incremental
    plan from next_committed() reads only the delta — the identical
    code path the offline suite proves on the mock broker."""
    topic = os.environ.get(
        "GOBBLIN_SPARK_LIVE_KAFKA_TOPIC", f"gobblin-live-{uuid.uuid4().hex[:8]}"
    )
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError:
        pytest.skip("kafka-python not installed to seed the test topic")
    prod = KafkaProducer(bootstrap_servers=KAFKA_BOOTSTRAP)
    for i in range(20):
        prod.send(topic, json.dumps({"i": i}).encode())
    prod.flush()
    time.sleep(1)

    earliest, latest = _kafka_admin_offsets(topic)
    ranges = K.plan_offsets(earliest, latest, None, topic)
    assert sum(r.end - r.start for r in ranges) == 20

    df = K.read_kafka_batch(live_spark, KAFKA_BOOTSTRAP, ranges)
    assert df.count() == 20

    # incremental second batch: produce 5 more, plan from the committed
    # watermark, read ONLY the delta
    committed = K.next_committed(ranges)
    for i in range(5):
        prod.send(topic, json.dumps({"i": 100 + i}).encode())
    prod.flush()
    prod.close()
    time.sleep(1)
    earliest, latest = _kafka_admin_offsets(topic)
    ranges2 = K.plan_offsets(earliest, latest, committed, topic)
    df2 = K.read_kafka_batch(live_spark, KAFKA_BOOTSTRAP, ranges2)
    vals = sorted(
        json.loads(r["value"].decode())["i"] for r in df2.collect()
    )
    assert vals == [100, 101, 102, 103, 104]


@live_kafka
@needs_kafka
def test_live_kafka_offsets_json_accepted_verbatim(live_spark):
    """The offsets JSON rendered by offsets_json() must be accepted by
    the real connector verbatim (field layout, string partition keys) —
    the serialization seam the mock cannot prove."""
    topic = os.environ.get(
        "GOBBLIN_SPARK_LIVE_KAFKA_TOPIC2", f"gobblin-live-{uuid.uuid4().hex[:8]}"
    )
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError:
        pytest.skip("kafka-python not installed to seed the test topic")
    prod = KafkaProducer(bootstrap_servers=KAFKA_BOOTSTRAP)
    for i in range(7):
        prod.send(topic, f"m{i}".encode())
    prod.flush()
    prod.close()
    time.sleep(1)
    earliest, latest = _kafka_admin_offsets(topic)
    starting, ending = K.offsets_json(
        K.plan_offsets(earliest, latest, None, topic)
    )
    df = (
        live_spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .option("endingOffsets", ending)
        .load()
    )
    assert df.count() == 7


@live_jdbc
@needs_jdbc
def test_live_jdbc_extract_sql_parses_and_prunes(live_spark):
    """extract_sql's projection + watermark predicate must parse on the
    real server through spark.read.jdbc — the dialect seam DuckDB
    cannot prove. Seeds its own table, reads it back through the SAME
    read_jdbc path the offline suite drives."""
    table = f"gobblin_live_{uuid.uuid4().hex[:8]}"
    src = live_spark.range(100).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % 7).cast("long").alias("grp"),
    )
    src.write.jdbc(JDBC_URL, table, mode="overwrite", properties=JDBC_PROPS)
    try:
        got = J.read_jdbc(
            live_spark,
            JDBC_URL,
            table,
            interval=WatermarkInterval("id", 9, 59),
            columns=["id", "grp"],
            properties=JDBC_PROPS,
        )
        assert got.count() == 50  # (9, 59] — low exclusive, high inclusive
        assert sorted(got.columns) == ["grp", "id"]
    finally:
        pass  # leave the table for post-mortem; it is uniquely named


@live_jdbc
@needs_jdbc
def test_live_jdbc_partition_predicates_tile_real_table(live_spark):
    """partition_predicates → spark.read.jdbc(predicates=...): N real
    source queries whose union is exactly the watermark range, no
    dup/gap — the parallel-extract seam (one predicate = one Gobblin
    WorkUnit = one Spark partition)."""
    table = f"gobblin_live_{uuid.uuid4().hex[:8]}"
    live_spark.range(1000).select(
        F.col("id").cast("long").alias("id")
    ).write.jdbc(JDBC_URL, table, mode="overwrite", properties=JDBC_PROPS)
    got = J.read_jdbc(
        live_spark,
        JDBC_URL,
        table,
        interval=WatermarkInterval("id", -1, 999),
        num_partitions=4,
        properties=JDBC_PROPS,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.select("id").distinct().count() == 1000


# ---------------------------------------------------------------------------
# live_rest: the urllib clients against an EXTERNAL HTTP endpoint.
# The offline suite (test_http_endpoint.py) already drives these same
# classes over real sockets against an in-process server; these tests
# re-run the contract against infrastructure the sandbox cannot host:
#
#     GOBBLIN_SPARK_LIVE_REST_BASE=https://host \
#     GOBBLIN_SPARK_LIVE_REST_RESOURCE=events \
#     GOBBLIN_SPARK_LIVE_REST_ORDER_BY=event_id \
#         pytest tests/test_live_connectors.py -m live_rest
#
# (the endpoint must speak the documented /rest/<resource> protocol —
# sources/http_endpoint.py's serve_endpoint is a reference server)
#
#     GOBBLIN_SPARK_LIVE_SOQL_BASE=https://instance.salesforce.com \
#     GOBBLIN_SPARK_LIVE_SOQL_TOKEN=<bearer> \
#     GOBBLIN_SPARK_LIVE_SOQL_ENTITY=Account \
#         pytest tests/test_live_connectors.py -m live_rest
# ---------------------------------------------------------------------------

REST_BASE = os.environ.get("GOBBLIN_SPARK_LIVE_REST_BASE")
SOQL_BASE = os.environ.get("GOBBLIN_SPARK_LIVE_SOQL_BASE")

live_rest = pytest.mark.live_rest

needs_rest = pytest.mark.skipif(
    not REST_BASE,
    reason="GOBBLIN_SPARK_LIVE_REST_BASE not set (live endpoint required)",
)
needs_soql = pytest.mark.skipif(
    not SOQL_BASE,
    reason="GOBBLIN_SPARK_LIVE_SOQL_BASE not set (live endpoint required)",
)


@live_rest
@needs_rest
def test_live_rest_fetch_contract(live_spark):
    """One page + keyset continuation from the live endpoint honors the
    fetch contract (records_json/records + next_after), and the page
    feeds the SAME read path the offline suite proves."""
    from incubator_gobblin_spark.sources.http_endpoint import HttpRestEndpoint

    resource = os.environ.get("GOBBLIN_SPARK_LIVE_REST_RESOURCE", "events")
    order_by = os.environ.get("GOBBLIN_SPARK_LIVE_REST_ORDER_BY", "event_id")
    ep = HttpRestEndpoint(REST_BASE, order_by=order_by)
    page = ep.fetch(resource, {"limit": 5, "order_by": order_by})
    recs = page.get("records_json", page.get("records"))
    assert isinstance(recs, list) and len(recs) <= 5
    if len(recs) == 5:
        cursor = page.get("next_after")
        assert cursor is not None
        page2 = ep.fetch(
            resource, {"limit": 5, "order_by": order_by, "after": cursor}
        )
        recs2 = page2.get("records_json", page2.get("records"))
        assert recs2 != recs  # the cursor advanced


@live_rest
@needs_rest
def test_live_rest_read_rest_end_to_end(live_spark):
    """read_rest against the live endpoint: high_watermark bounds the
    interval, executor tasks page over the wire, row count > 0 and the
    watermark column respects the half-open slice."""
    from incubator_gobblin_spark.sources import rest_api as R
    from incubator_gobblin_spark.sources.http_endpoint import HttpRestEndpoint

    resource = os.environ.get("GOBBLIN_SPARK_LIVE_REST_RESOURCE", "events")
    order_by = os.environ.get("GOBBLIN_SPARK_LIVE_REST_ORDER_BY", "event_id")
    wm = os.environ.get("GOBBLIN_SPARK_LIVE_REST_WM_COLUMN", order_by)
    schema = os.environ.get(
        "GOBBLIN_SPARK_LIVE_REST_SCHEMA", f"{order_by} long"
    )
    ep = HttpRestEndpoint(REST_BASE, order_by=order_by)
    high = ep.high_watermark(resource, wm)
    assert high is not None
    src = R.RestApiSource(
        resource=resource, schema=schema, wm_column=wm,
        page_size=500, rate_per_sec=50.0,
    )
    df = R.read_rest(
        live_spark, src, ep,
        WatermarkInterval(wm, None, high),
        num_partitions=2,
    )
    assert df.count() > 0


@live_rest
@needs_soql
def test_live_soql_query_pages_to_done(live_spark):
    """queryAll + nextRecordsUrl chaining against a live Salesforce-
    shaped endpoint: pages terminate at done=true and records carry
    the selected fields."""
    from incubator_gobblin_spark.sources.http_endpoint import HttpSoqlEndpoint

    entity = os.environ.get("GOBBLIN_SPARK_LIVE_SOQL_ENTITY", "Account")
    token = os.environ.get("GOBBLIN_SPARK_LIVE_SOQL_TOKEN")
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    ep = HttpSoqlEndpoint(
        SOQL_BASE,
        api_version=os.environ.get(
            "GOBBLIN_SPARK_LIVE_SOQL_VERSION", "v59.0"
        ),
        headers=headers,
    )
    resp = ep.query(f"SELECT Id FROM {entity} LIMIT 10")
    assert "records" in resp and "done" in resp
    pages = 1
    while not resp.get("done", True) and pages < 50:
        resp = ep.query_more(resp["nextRecordsUrl"])
        pages += 1
    assert resp.get("done", True)
