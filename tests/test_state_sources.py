"""State store, watermark partitioning, and file-source tests."""

from datetime import datetime

from pyspark.sql import functions as F

from incubator_gobblin_spark.operators.watermark import (
    WatermarkInterval,
    high_watermark,
    partition_interval,
)
from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sources import files as FS
from incubator_gobblin_spark.state import StateStore, TableState


def test_state_store_roundtrip(tmp_path):
    store = StateStore(str(tmp_path))
    assert store.get("t").high_watermark is None

    ts = datetime(2026, 8, 13, 10, 30, 0)
    store.commit("t", TableState(high_watermark=ts, last_run_id="r1",
                                 extra={"offsets": {"0": 100, "1": 200}}))
    got = store.get("t")
    assert got.high_watermark == ts
    assert got.last_run_id == "r1"
    assert got.extra["offsets"] == {"0": 100, "1": 200}

    store.commit("t", TableState(high_watermark=42))
    assert store.get("t").high_watermark == 42


def test_watermark_interval_exclusive_inclusive(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    wm = WatermarkInterval("v", low=3, high=7)
    got = sorted(r["v"] for r in wm.apply(df).collect())
    assert got == [4, 5, 6, 7]
    assert high_watermark(wm.apply(df), "v") == 7


def test_partition_interval_no_gaps():
    lo = datetime(2026, 1, 1)
    hi = datetime(2026, 1, 11)
    parts = partition_interval(lo, hi, 4)
    assert len(parts) == 4
    assert parts[0][0] == lo and parts[-1][1] == hi
    for (a, b), (c, d) in zip(parts, parts[1:]):
        assert b == c  # contiguous


def test_read_csv_json_text(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    csv_p, json_p = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", True).csv(csv_p)
    df.write.json(json_p)

    got_csv = FS.read_csv(spark, csv_p, schema="id int, s string")
    assert sorted(r["s"] for r in got_csv.collect()) == ["a", "b"]
    got_json = FS.read_json(spark, json_p, schema="id int, s string")
    assert got_json.count() == 2
    txt = FS.read_text(spark, json_p)
    assert txt.count() == 2


def test_read_date_partitioned_between_watermarks(spark, tmp_path):
    root = tmp_path / "lake"
    df = spark.range(5).withColumnRenamed("id", "v")
    for day in ["2026/08/01", "2026/08/02", "2026/08/03"]:
        df.write.parquet(str(root / day))
    out = FS.read_date_partitioned(
        spark,
        str(root),
        low=datetime(2026, 8, 1).date(),
        high=datetime(2026, 8, 3).date(),
    )
    # low-exclusive, high-inclusive: days 02 and 03
    assert out.count() == 10
    days = {str(r["_partition_date"]) for r in out.select("_partition_date").distinct().collect()}
    assert days == {"2026-08-02", "2026-08-03"}


def test_nanos_parquet_roundtrip(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    assert dict(events.dtypes)["ts"] == "timestamp"
    lo = events.select(F.min("ts")).first()[0]
    assert lo.year == 2024


# ------------------------------------------------ DB state store (CAS)


def test_db_state_store_roundtrip_and_versions(tmp_path):
    from incubator_gobblin_spark.state import DbStateStore

    st = DbStateStore(str(tmp_path / "state.db"))
    s0, v0 = st.get_versioned("orders")
    assert v0 == 0 and s0.high_watermark is None
    st.commit("orders", TableState(high_watermark=100, last_run_id="r1"))
    s1, v1 = st.get_versioned("orders")
    assert (s1.high_watermark, s1.last_run_id, v1) == (100, "r1", 1)
    # datetime watermarks survive the JSON round trip typed
    ts = datetime(2026, 8, 14, 12, 0, 0)
    st.commit("events", TableState(high_watermark=ts, extra={"lo": ts}))
    s2 = st.get("events")
    assert s2.high_watermark == ts and s2.extra["lo"] == ts


def test_db_state_store_cas_rejects_stale_writer(tmp_path):
    from incubator_gobblin_spark.state import DbStateStore

    st = DbStateStore(str(tmp_path / "state.db"))
    st.commit("t", TableState(high_watermark=10))
    _, v = st.get_versioned("t")
    # two writers read the same version; exactly one CAS wins
    assert st.commit_cas("t", TableState(high_watermark=20), v)
    assert not st.commit_cas("t", TableState(high_watermark=15), v)
    assert st.get("t").high_watermark == 20
    # version-0 CAS (create) races: second create loses
    assert st.commit_cas("new", TableState(high_watermark=1), 0)
    assert not st.commit_cas("new", TableState(high_watermark=2), 0)


def test_db_state_store_watermark_advance_is_monotonic(tmp_path):
    from incubator_gobblin_spark.state import DbStateStore

    st = DbStateStore(str(tmp_path / "state.db"))
    assert st.advance_watermark("t", 50, "r1")
    assert not st.advance_watermark("t", 40, "zombie")  # backwards: refused
    assert not st.advance_watermark("t", 50, "dup")  # equal: refused
    assert st.advance_watermark("t", 60, "r2")
    s = st.get("t")
    assert (s.high_watermark, s.last_run_id) == (60, "r2")


def test_db_state_store_concurrent_advances_serialize(tmp_path):
    """N threads race advance_watermark with distinct targets; the BEGIN
    IMMEDIATE write lock must serialize them so the final watermark is
    the maximum and never regresses mid-race (the MysqlDatasetStateStore
    property the JSON-file store cannot give)."""
    import random
    import threading

    from incubator_gobblin_spark.state import DbStateStore

    st = DbStateStore(str(tmp_path / "state.db"))
    targets = list(range(1, 33))
    random.Random(7).shuffle(targets)
    results = {}

    def worker(v):
        results[v] = st.advance_watermark("t", v, f"run{v}")

    threads = [threading.Thread(target=worker, args=(v,)) for v in targets]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert st.get("t").high_watermark == 32
    assert results[32] is True  # the max always lands
    # winners' watermarks were strictly increasing: replaying only the
    # successful advances in commit order reconstructs a sorted chain
    wins = sorted(v for v, ok in results.items() if ok)
    assert wins[-1] == 32 and len(wins) >= 1
