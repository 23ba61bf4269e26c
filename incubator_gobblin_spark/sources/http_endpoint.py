"""Real-wire HTTP endpoints for the REST / SOQL / egress families.

Everything else in the connector stack is wire-agnostic: ``read_rest``
/ ``read_soql`` / ``write_egress`` take an endpoint *object* and the
offline suite proves the planning/paging/retry logic against file- and
DuckDB-backed doubles. This module supplies the missing wire: stdlib
``urllib.request`` clients that speak actual HTTP with the SAME
duck-type contracts, so swapping the double for a URL is a one-line
change — the reference's split between connector logic and
``RestApiConnector.getConnection`` (gobblin-core
``.../extractor/extract/restapi/RestApiConnector.java:58``, which owns
the HttpClient request execution; ``SalesforceConnector`` adds the
query/queryMore REST specifics).

Client half (picklable — holds only url/headers/timeout — so the
objects ship into mapInPandas closures like the doubles do):

- :class:`HttpRestEndpoint` — ``fetch`` / ``high_watermark`` /
  ``pk_bounds`` over a documented query-param protocol (the
  ``FileBackedRestEndpoint`` contract on a wire).
- :class:`HttpSoqlEndpoint` — Salesforce REST shapes:
  ``/services/data/<ver>/queryAll?q=...``, ``nextRecordsUrl`` cursor
  paths, Bulk-API result fetch.
- :class:`HttpJsonTransport` — POST one JSON array per batch; the
  ``write_egress`` transport callable (AsyncHttpWriter's role).

Server half (test infrastructure, driver-side only):
:func:`serve_endpoint` wraps the in-repo doubles in a
``ThreadingHTTPServer`` speaking the same protocol, so the offline
suite drives the REAL urllib path end to end over 127.0.0.1 — executors
in local mode reach it — while ``live_rest``-marked tests point the
same client classes at an external endpoint via env vars.

HTTP error mapping: 401 raises :class:`AuthExpiredError` (the
TokenExpiringEndpoint / AuthenticatingEndpoint re-auth signal), other
HTTP/socket failures raise their urllib exceptions — the callers'
bounded-retry loops treat any exception as a transient nack, which is
exactly the reference's retry contract.
"""

from __future__ import annotations

import json
from typing import Any

__all__ = [
    "HttpRestEndpoint",
    "HttpSoqlEndpoint",
    "HttpJsonTransport",
    "serve_endpoint",
]


def _get_json(url: str, headers: dict[str, str], timeout: float) -> Any:
    import urllib.error
    import urllib.request

    from incubator_gobblin_spark.sources.rest_api import AuthExpiredError

    req = urllib.request.Request(
        url, headers={"Accept": "application/json", **headers}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        if e.code == 401:
            raise AuthExpiredError(f"HTTP 401 from {url}") from e
        raise


class HttpRestEndpoint:
    """The ``FileBackedRestEndpoint`` contract over HTTP.

    Wire protocol (query params mirror the fetch params dict; the
    server side is any service exposing these routes —
    :func:`serve_endpoint` provides one for tests):

    - ``GET {base}/rest/{resource}?wm_column&low&high&limit&offset&
      after&order_by`` -> ``{"records_json": [...], "next_after": x}``
      (or the v1 ``{"records": [...]}`` — passed through verbatim,
      both consumer contracts are accepted downstream)
    - ``GET {base}/rest/{resource}/watermark?wm_column=c`` ->
      ``{"max": v}``
    - ``GET {base}/rest/{resource}/pk_bounds?pk_column=c&chunk_size=n``
      -> ``{"bounds": [...]}``
    """

    def __init__(
        self,
        base_url: str,
        headers: dict[str, str] | None = None,
        timeout: float = 30.0,
        order_by: str | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.headers = dict(headers or {})
        self.timeout = float(timeout)
        self.order_by = order_by

    def _url(self, path: str, params: dict[str, Any] | None = None) -> str:
        from urllib.parse import urlencode

        qs = urlencode(
            {k: v for k, v in (params or {}).items() if v is not None}
        )
        return f"{self.base_url}{path}" + (f"?{qs}" if qs else "")

    def fetch(self, resource: str, params: dict[str, Any]) -> dict[str, Any]:
        from urllib.parse import quote

        body = _get_json(
            self._url(f"/rest/{quote(resource)}", params),
            self.headers,
            self.timeout,
        )
        if isinstance(body, list):
            return {"records": body}
        return body

    def high_watermark(self, resource: str, wm_column: str) -> Any:
        from urllib.parse import quote

        return _get_json(
            self._url(
                f"/rest/{quote(resource)}/watermark", {"wm_column": wm_column}
            ),
            self.headers,
            self.timeout,
        )["max"]

    def pk_bounds(
        self, resource: str, pk_column: str, chunk_size: int
    ) -> list:
        from urllib.parse import quote

        return _get_json(
            self._url(
                f"/rest/{quote(resource)}/pk_bounds",
                {"pk_column": pk_column, "chunk_size": int(chunk_size)},
            ),
            self.headers,
            self.timeout,
        )["bounds"]


class HttpSoqlEndpoint:
    """Salesforce REST query surface over HTTP (SalesforceConnector's
    getQueryResultResponse shapes):

    - ``query(soql)`` -> GET of :func:`soql_url`'s path (the
      getSoqlUrl:470 encoding — ``/services/data/v{ver}/queryAll/?q=``;
      ``query_all=False`` uses ``/query/`` — no soft-deleted rows)
    - ``query_more(nextRecordsUrl)`` -> GET of the server-relative
      cursor path the previous page returned, verbatim
    - ``fetch_result(job, batch, result)`` -> the Bulk API v1 result
      path ``GET {base}/services/async/{ver}/job/{job}/batch/{batch}/
      result/{result}`` (result chaining; returns the JSON array)
    """

    def __init__(
        self,
        base_url: str,
        api_version: str = "59.0",
        headers: dict[str, str] | None = None,
        timeout: float = 30.0,
        query_all: bool = True,
    ):
        self.base_url = base_url.rstrip("/")
        # accept both "59.0" and "v59.0"
        self.api_version = api_version.lstrip("v")
        self.headers = dict(headers or {})
        self.timeout = float(timeout)
        self.query_all = bool(query_all)

    def query(self, soql: str) -> dict:
        from incubator_gobblin_spark.sources.soql import soql_url

        path = soql_url(soql, api_version=self.api_version)
        if not self.query_all:
            path = path.replace("/queryAll/", "/query/", 1)
        return _get_json(
            f"{self.base_url}{path}", self.headers, self.timeout
        )

    def query_more(self, next_records_url: str) -> dict:
        # Salesforce documents nextRecordsUrl as server-relative, but
        # some proxies hand back absolute URLs — accept both rather
        # than producing "https://basehttps://..." garbage
        url = (
            next_records_url
            if next_records_url.startswith(("http://", "https://"))
            else f"{self.base_url}{next_records_url}"
        )
        return _get_json(url, self.headers, self.timeout)

    def fetch_result(self, job_id: str, batch_id: str, result_id: str) -> list:
        from urllib.parse import quote

        url = (
            f"{self.base_url}/services/async/{self.api_version}/job/"
            f"{quote(str(job_id))}/batch/{quote(str(batch_id))}/result/"
            f"{quote(str(result_id))}"
        )
        return _get_json(url, self.headers, self.timeout)


class HttpJsonTransport:
    """``write_egress`` transport: POST one JSON array per batch.
    Raising on any non-2xx makes the writer's bounded-retry +
    task-replay at-least-once contract apply unchanged."""

    def __init__(
        self,
        url: str,
        headers: dict[str, str] | None = None,
        timeout: float = 30.0,
    ):
        self.url = url
        self.headers = dict(headers or {})
        self.timeout = float(timeout)

    def __call__(self, batch: list[dict]) -> None:
        import urllib.error
        import urllib.request

        from incubator_gobblin_spark.sources.rest_api import AuthExpiredError

        data = json.dumps(batch, default=str).encode("utf-8")
        req = urllib.request.Request(
            self.url,
            data=data,
            headers={
                "Content-Type": "application/json",
                "Accept": "application/json",
                **self.headers,
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 401:
                raise AuthExpiredError(f"HTTP 401 from {self.url}") from e
            raise


# ---------------------------------------------------------------------------
# Server half — test infrastructure (driver-side only, never pickled)
# ---------------------------------------------------------------------------


def serve_endpoint(
    rest: Any = None,
    soql: Any = None,
    bulk: Any = None,
    ingest_dir: str | None = None,
    host: str = "127.0.0.1",
    fail_first_n: int = 0,
    auth_token: str | None = None,
    port: int = 0,
):
    """Expose in-repo endpoint doubles over real HTTP.

    Routes (exactly the client protocol above):

    - ``/rest/<resource>[...]`` -> ``rest`` (FileBackedRestEndpoint)
    - ``/services/data/...`` -> ``soql`` (FileBackedSoqlEndpoint)
    - ``/services/async/...`` -> ``bulk`` (FileBackedBulkEndpoint)
    - ``POST /ingest`` -> spool each received batch as one JSON file
      under ``ingest_dir`` (the egress assertion surface)

    ``fail_first_n`` 503s the first N requests (retry-path coverage);
    ``auth_token`` 401s any request not carrying
    ``Authorization: Bearer <token>`` (the AuthExpiredError seam).
    Returns ``(server, base_url)``; callers ``server.shutdown()``.
    """
    import http.server
    import threading
    import uuid as _uuid
    from urllib.parse import parse_qs, unquote, urlsplit

    lock = threading.Lock()
    state = {"fail_left": int(fail_first_n)}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet test output
            pass

        def _reply(self, obj, status: int = 200):
            body = json.dumps(obj, default=str).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _maybe_fail(self) -> bool:
            if auth_token is not None and self.headers.get(
                "Authorization"
            ) != f"Bearer {auth_token}":
                self._reply({"error": "invalid session"}, status=401)
                return True
            with lock:
                if state["fail_left"] > 0:
                    state["fail_left"] -= 1
                    self._reply({"error": "transient"}, status=503)
                    return True
            return False

        def do_GET(self):
            if self._maybe_fail():
                return
            parts = urlsplit(self.path)
            q = {k: v[0] for k, v in parse_qs(parts.query).items()}
            segs = [unquote(s) for s in parts.path.split("/") if s]
            try:
                if segs[0] == "rest" and rest is not None:
                    resource = segs[1]
                    if len(segs) == 3 and segs[2] == "watermark":
                        self._reply(
                            {
                                "max": rest.high_watermark(
                                    resource, q["wm_column"]
                                )
                            }
                        )
                    elif len(segs) == 3 and segs[2] == "pk_bounds":
                        self._reply(
                            {
                                "bounds": rest.pk_bounds(
                                    resource,
                                    q["pk_column"],
                                    int(q["chunk_size"]),
                                )
                            }
                        )
                    else:
                        params = dict(q)
                        for k in ("limit", "offset"):
                            if k in params:
                                params[k] = int(params[k])
                        with lock:
                            self._reply(rest.fetch(resource, params))
                elif segs[0] == "services" and segs[1] == "data":
                    if "q" in q:
                        with lock:
                            self._reply(soql.query(q["q"]))
                    else:
                        # a nextRecordsUrl cursor path, echoed verbatim
                        with lock:
                            self._reply(soql.query_more(parts.path))
                elif segs[0] == "services" and segs[1] == "async":
                    # Bulk API v1 result path:
                    # /services/async/<ver>/job/<j>/batch/<b>/result/<r>
                    self._reply(
                        bulk.fetch_result(segs[4], segs[6], segs[8])
                    )
                else:
                    self._reply({"error": f"no route {parts.path}"}, 404)
            except (KeyError, IndexError) as e:
                self._reply({"error": repr(e)}, 404)

        def do_POST(self):
            if self._maybe_fail():
                return
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            parts = urlsplit(self.path)
            if parts.path == "/ingest" and ingest_dir is not None:
                import os

                os.makedirs(ingest_dir, exist_ok=True)
                name = f"batch-{_uuid.uuid4().hex}.json"
                with open(os.path.join(ingest_dir, name), "wb") as fh:
                    fh.write(body)
                self._reply({"ok": True})
            else:
                self._reply({"error": f"no route {parts.path}"}, 404)

    server = http.server.ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base_url = f"http://{host}:{server.server_address[1]}"
    return server, base_url
