"""The REAL wire: urllib.request clients against an in-process HTTP
server wrapping the file/DuckDB-backed doubles — the same extraction
code paths the offline suite proves, now actually speaking HTTP end to
end (reference seam: gobblin-core RestApiConnector.java:58 getConnection
/ HttpClient execution; SalesforceConnector query/queryMore).

Executors in local mode reach 127.0.0.1, so read_rest / read_soql /
write_egress run their mapInPandas tasks through genuine sockets here.
The ``live_rest`` markers in test_live_connectors.py point the SAME
client classes at an external endpoint."""

from datetime import datetime, timedelta

import duckdb
import pytest

from incubator_gobblin_spark.operators.watermark import (
    WatermarkInterval,
    WatermarkType,
)
from incubator_gobblin_spark.sources import rest_api as R
from incubator_gobblin_spark.sources import soql as S
from incubator_gobblin_spark.sources.http_endpoint import (
    HttpJsonTransport,
    HttpRestEndpoint,
    HttpSoqlEndpoint,
    serve_endpoint,
)


@pytest.fixture()
def rest_server(sf_dir):
    inner = R.FileBackedRestEndpoint(
        {"events": f"{sf_dir}/events.parquet"}, order_by="event_id"
    )
    server, base = serve_endpoint(rest=inner)
    yield base
    server.shutdown()


def _events_source(**kw):
    defaults = dict(
        resource="events",
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
        wm_column="ts",
        page_size=700,
        rate_per_sec=10_000.0,
    )
    defaults.update(kw)
    return R.RestApiSource(**defaults)


def test_http_fetch_page_matches_double(rest_server, sf_dir):
    """One page over the wire == one page from the double directly
    (records_json bodies and the keyset cursor survive serialization)."""
    inner = R.FileBackedRestEndpoint(
        {"events": f"{sf_dir}/events.parquet"}, order_by="event_id"
    )
    http = HttpRestEndpoint(rest_server, order_by="event_id")
    params = {
        "wm_column": "ts",
        "low": "2024-01-01 00:00:00",
        "high": "2024-01-31 00:00:00",
        "limit": 50,
        "order_by": "event_id",
    }
    a = inner.fetch("events", dict(params))
    b = http.fetch("events", dict(params))
    assert a["records_json"] == b["records_json"]
    assert a["next_after"] == b["next_after"]
    # keyset continuation through the cursor
    a2 = inner.fetch("events", {**params, "after": a["next_after"]})
    b2 = http.fetch("events", {**params, "after": b["next_after"]})
    assert a2["records_json"] == b2["records_json"]
    # watermark + pk_bounds round-trip (ints come back as ints)
    assert http.pk_bounds("events", "event_id", 1000) == inner.pk_bounds(
        "events", "event_id", 1000
    )


def test_read_rest_over_http_end_to_end(spark, sf_dir, rest_server):
    """read_rest with the urllib endpoint: executor tasks page a REAL
    HTTP server; result equals the direct DuckDB slice."""
    df = R.read_rest(
        spark,
        _events_source(),
        HttpRestEndpoint(rest_server, order_by="event_id"),
        WatermarkInterval("ts", datetime(2024, 1, 1), datetime(2024, 1, 31)),
        num_partitions=4,
    )
    got = {r["event_id"] for r in df.select("event_id").collect()}
    want = {
        r[0]
        for r in duckdb.sql(
            f"SELECT event_id FROM '{sf_dir}/events.parquet' "
            "WHERE ts > TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-31'"
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_read_rest_pk_chunked_over_http(spark, sf_dir, rest_server):
    """PK chunking plans via GET /pk_bounds, then fetches each chunk
    over the wire."""
    df = R.read_rest_pk_chunked(
        spark,
        _events_source(page_size=1500),
        HttpRestEndpoint(rest_server, order_by="event_id"),
        pk_column="event_id",
        chunk_size=3000,
    )
    n = duckdb.sql(
        f"SELECT count(*), count(DISTINCT event_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert df.count() == n[0]
    assert df.select("event_id").distinct().count() == n[1]


def test_http_503_retries_then_succeeds(spark, sf_dir):
    """Transient 5xx from the wire rides the existing bounded-retry
    loop — no page duplicated, no record lost."""
    inner = R.FileBackedRestEndpoint(
        {"events": f"{sf_dir}/events.parquet"}, order_by="event_id"
    )
    server, base = serve_endpoint(rest=inner, fail_first_n=2)
    try:
        df = R.read_rest(
            spark,
            _events_source(page_size=5000, max_retries=3,
                           retry_backoff_sec=0.01),
            HttpRestEndpoint(base, order_by="event_id"),
            WatermarkInterval(
                "ts", datetime(2024, 1, 1), datetime(2024, 1, 31)
            ),
            num_partitions=2,
        )
        want = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/events.parquet' "
            "WHERE ts > TIMESTAMP '2024-01-01' AND ts <= TIMESTAMP '2024-01-31'"
        ).fetchone()[0]
        assert df.count() == want
    finally:
        server.shutdown()


def test_http_401_raises_auth_expired(sf_dir):
    """A 401 maps to AuthExpiredError (the TokenExpiringEndpoint /
    AuthenticatingEndpoint re-auth signal); the right bearer passes."""
    inner = R.FileBackedRestEndpoint(
        {"events": f"{sf_dir}/events.parquet"}, order_by="event_id"
    )
    server, base = serve_endpoint(rest=inner, auth_token="sesame")
    try:
        with pytest.raises(R.AuthExpiredError):
            HttpRestEndpoint(base).high_watermark("events", "ts")
        ok = HttpRestEndpoint(
            base, headers={"Authorization": "Bearer sesame"}
        ).high_watermark("events", "ts")
        assert ok is not None
    finally:
        server.shutdown()


def test_read_soql_over_http_end_to_end(spark):
    """read_soql through the urllib Salesforce client: /queryAll?q=
    executes the builders' SOQL, pages chain through nextRecordsUrl
    paths over the wire, and the union is the exact watermark slice."""
    base_ts = datetime(2024, 1, 1)
    rows = [
        {
            "Id": f"00{i:03d}",
            "Amount": i * 10,
            "SystemModstamp": base_ts + timedelta(hours=i),
        }
        for i in range(48)
    ]
    inner = S.FileBackedSoqlEndpoint({"Opportunity": rows}, page_size=5)
    server, base = serve_endpoint(soql=inner)
    try:
        got = S.read_soql(
            spark,
            HttpSoqlEndpoint(base),
            "Opportunity",
            ["Id", "Amount", "SystemModstamp"],
            "Id string, Amount long, SystemModstamp timestamp",
            interval=WatermarkInterval(
                "SystemModstamp",
                base_ts + timedelta(hours=7),
                base_ts + timedelta(hours=31),
            ),
            wm_type=WatermarkType.TIMESTAMP,
            num_partitions=3,
        )
        ids = sorted(r["Id"] for r in got.collect())
        assert ids == [f"00{i:03d}" for i in range(8, 32)]
        assert got.count() == 24
    finally:
        server.shutdown()


def test_bulk_results_over_http(spark):
    """Bulk-API result-id chaining over the wire: every (batch, result)
    file fetched by GET, empty results legal."""
    import json as _json

    results = {
        ("b1", "r1"): [_json.dumps({"Id": i}) for i in range(5)],
        ("b2", "r2"): [_json.dumps({"Id": i}) for i in range(5, 8)],
        ("b3", "r3"): [],
    }
    inner = S.FileBackedBulkEndpoint(results)
    # fail_first_n: a 503 from the wire (urllib HTTPError) must ride
    # the same bounded retry as the double's ConnectionError
    server, base = serve_endpoint(bulk=inner, fail_first_n=1)
    try:
        files = S.parse_batch_result_ids("750x0", "b1:r1,b2:r2,b3:r3")
        df = S.read_bulk_results(
            spark, HttpSoqlEndpoint(base), files, "Id long"
        )
        assert sorted(r["Id"] for r in df.collect()) == list(range(8))
    finally:
        server.shutdown()


def test_write_egress_over_http(spark, sf_dir, tmp_path):
    """write_egress with the urllib POST transport: every row lands in
    the server's spool exactly once (no transient failures configured,
    so at-least-once degenerates to exactly-once here)."""
    import glob
    import json as _json

    from incubator_gobblin_spark.sinks.egress import EgressConfig, write_egress
    from incubator_gobblin_spark.session import load_table

    spool = str(tmp_path / "spool")
    server, base = serve_endpoint(ingest_dir=spool)
    try:
        df = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
        res = write_egress(
            df,
            HttpJsonTransport(base + "/ingest"),
            EgressConfig(batch_size=7, rate_per_sec=None),
        )
        assert res.records_sent == df.count()
        got = []
        for f in glob.glob(spool + "/batch-*.json"):
            with open(f) as fh:
                got.extend(_json.load(fh))
        assert sorted(r["n_nationkey"] for r in got) == sorted(
            r["n_nationkey"] for r in df.collect()
        )
    finally:
        server.shutdown()


def test_write_egress_http_retry_on_503(spark, sf_dir, tmp_path):
    """A transient 503 nacks the batch; the bounded retry resends it —
    total delivered batches complete, duplicates possible only for the
    nacked batch (at-least-once, asserted as a superset)."""
    import glob
    import json as _json

    from incubator_gobblin_spark.sinks.egress import EgressConfig, write_egress
    from incubator_gobblin_spark.session import load_table

    spool = str(tmp_path / "spool")
    server, base = serve_endpoint(ingest_dir=spool, fail_first_n=1)
    try:
        df = load_table(spark, sf_dir, "nation").select("n_nationkey")
        res = write_egress(
            df,
            HttpJsonTransport(base + "/ingest"),
            EgressConfig(batch_size=5, max_retries=3, backoff_sec=0.01),
        )
        assert res.retries >= 1
        got = []
        for f in glob.glob(spool + "/batch-*.json"):
            with open(f) as fh:
                got.extend(_json.load(fh))
        assert {r["n_nationkey"] for r in got} == {
            r["n_nationkey"] for r in df.collect()
        }
    finally:
        server.shutdown()


def test_http_fetch_accepts_bare_list_bodies(sf_dir):
    """An endpoint replying with a bare JSON array (no envelope) is the
    v1 records contract — HttpRestEndpoint must wrap it."""
    import http.server
    import json
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps([{"id": 1}, {"id": 2}]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ep = HttpRestEndpoint(f"http://127.0.0.1:{srv.server_address[1]}")
        page = ep.fetch("things", {"limit": 2})
        assert page == {"records": [{"id": 1}, {"id": 2}]}
    finally:
        srv.shutdown()
