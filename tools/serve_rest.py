#!/usr/bin/env python
"""Host the reference REST/SOQL HTTP server over parquet resources —
the serving half of sources/http_endpoint.py as a CLI, so the
``live_rest`` conformance suite (and any HttpRestEndpoint user) has a
real endpoint to point at:

    python tools/serve_rest.py events=/root/testdata/sf0.1/events.parquet \\
        --order-by event_id --port 8080

then, from another machine or shell:

    GOBBLIN_SPARK_LIVE_REST_BASE=http://host:8080 \\
    GOBBLIN_SPARK_LIVE_REST_RESOURCE=events \\
    GOBBLIN_SPARK_LIVE_REST_ORDER_BY=event_id \\
        pytest tests/test_live_connectors.py -m live_rest

Options: ``--auth-token T`` requires ``Authorization: Bearer T``
(exercises the 401/AuthExpiredError path); ``--fail-first N`` 503s the
first N requests (exercises bounded retries).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "resources", nargs="+",
        help="name=path.parquet pairs served as /rest/<name>",
    )
    ap.add_argument("--order-by", default=None, help="default paging order key")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0, help="0 = ephemeral")
    ap.add_argument("--auth-token", default=None)
    ap.add_argument("--fail-first", type=int, default=0)
    args = ap.parse_args()

    from incubator_gobblin_spark.sources.http_endpoint import serve_endpoint
    from incubator_gobblin_spark.sources.rest_api import FileBackedRestEndpoint

    resources = dict(pair.split("=", 1) for pair in args.resources)
    for name, path in resources.items():
        if not os.path.exists(path):
            ap.error(f"resource {name}: no such file {path}")
    inner = FileBackedRestEndpoint(resources, order_by=args.order_by)
    server, base = serve_endpoint(
        rest=inner,
        auth_token=args.auth_token,
        fail_first_n=args.fail_first,
        host=args.host,
        port=args.port,
    )
    print(f"serving {sorted(resources)} at {base}  (Ctrl-C to stop)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
