"""Streaming REST source: ``readStream.format("reststream")`` tails a
REST resource by watermark — the Structured Streaming side of
``sources/rest_api.py``.

Reference: the streaming half of the reference's extractor family —
KafkaStreamingExtractor (gobblin-modules/gobblin-kafka-common/...
/KafkaStreamingExtractor.java:137) keeps per-partition checkpointable
watermarks; this source does the same for a watermark-paged REST API
(RestApiExtractor.java:61 semantics): each microbatch covers the
half-open watermark interval (last-committed, current-source-max], the
interval tiles into independent workunits (one input partition each,
the Partitioner analogue), and the consumed high watermark lives in
the streaming checkpoint's offset log — restart resumes exactly where
the last committed batch ended, no reprocess, no gap.

Delivery contract: each offset interval is read at most once by the
committed stream; replay of an uncommitted batch re-fetches the SAME
interval, so end-to-end exactly-once holds when the API serves a
stable snapshot per (low, high] range (true for the file-backed double
and for any source where rows are immutable once their watermark is
past — the same assumption QueryBasedSource makes for incremental
pulls). Late mutations below the committed watermark are invisible, as
in the reference.

The endpoint is built from options (offline: the parquet-backed
:class:`~incubator_gobblin_spark.sources.rest_api.FileBackedRestEndpoint`
double; production would construct an HTTP client from a url option
here) because Python DataSources receive only string options.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["RestStreamDataSource", "register"]


def _parse_wm(s: str | None) -> Any:
    """Offset-string -> watermark value (int, datetime, or raw str)."""
    if not s:
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        return s


def _fmt_wm(v: Any) -> str:
    if v is None:
        return ""
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


class _WmRange(InputPartition):
    def __init__(self, lo: str | None, hi: str | None):
        self.lo = lo
        self.hi = hi


class RestStreamReader(DataSourceStreamReader):
    def __init__(self, options, fields: list[tuple[str, str]]):
        self.path = options["path"]
        self.resource = options.get("resource", "resource")
        self.wm = options["wm"]
        # (name, simpleString) pairs — parsed driver-side because DDL
        # parsing needs a live SparkSession, which workers don't have
        self.field_types = fields
        self.order = options.get("orderby") or self.wm
        self.page_size = int(options.get("pagesize", "1000"))
        self.num_partitions = int(options.get("numpartitions", "4"))
        self.start_opt = options.get("startingposition", "earliest").lower()

    def _endpoint(self):
        from incubator_gobblin_spark.sources.rest_api import (
            FileBackedRestEndpoint,
        )

        return FileBackedRestEndpoint(
            {self.resource: self.path}, order_by=self.order
        )

    def initialOffset(self) -> dict:
        if self.start_opt == "latest":
            return {"wm": _fmt_wm(
                self._endpoint().high_watermark(self.resource, self.wm)
            )}
        return {"wm": ""}

    def latestOffset(self) -> dict:
        return {"wm": _fmt_wm(
            self._endpoint().high_watermark(self.resource, self.wm)
        )}

    def partitions(self, start: dict, end: dict):
        from incubator_gobblin_spark.operators.watermark import (
            WatermarkInterval,
        )
        from incubator_gobblin_spark.sources.rest_api import _split_units

        lo, hi = start.get("wm") or None, end.get("wm") or None
        if hi is None or lo == hi:
            return [_WmRange(None, None)]  # Spark requires >=1 partition
        try:
            units = _split_units(
                WatermarkInterval(self.wm, _parse_wm(lo), _parse_wm(hi)),
                self.num_partitions,
            )
        except (TypeError, ValueError):
            units = [(lo, hi)]  # non-tileable watermark type: one unit
        return [_WmRange(u_lo, u_hi) for u_lo, u_hi in units]

    def read(self, part: _WmRange):
        if part.hi is None and part.lo is None:
            return
        from datetime import date

        def _conv(type_str: str):
            if type_str.startswith("timestamp"):
                return lambda v: None if v is None else datetime.fromisoformat(v)
            if type_str == "date":
                return lambda v: None if v is None else date.fromisoformat(v)
            return lambda v: v

        fields = [(name, _conv(t)) for name, t in self.field_types]
        endpoint = self._endpoint()
        after = None
        while True:
            params = {
                "wm_column": self.wm,
                "low": part.lo,
                "high": part.hi,
                "limit": self.page_size,
                "order_by": self.order,
            }
            if after is not None:
                params["after"] = after
            import json as _json

            page = endpoint.fetch(self.resource, params)
            if "records_json" in page:
                recs = [_json.loads(s) for s in page["records_json"]]
            else:
                recs = page["records"]
            for r in recs:
                yield tuple(conv(r.get(name)) for name, conv in fields)
            if recs:
                after = recs[-1].get(self.order)
            if len(recs) < self.page_size:
                break
            if after is None:
                raise ValueError(
                    f"cursor paging needs {self.order!r} in every record"
                )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("reststream").option("path", parquet)
    .option("resource", name).option("wm", col).schema(ddl).load()``"""

    def __init__(self, options):
        super().__init__(options)
        self.options = {k.lower(): v for k, v in options.items()}

    @classmethod
    def name(cls):
        return "reststream"

    def schema(self):
        ddl = self.options.get("ddl")
        if not ddl:
            raise ValueError("reststream requires the 'ddl' option")
        return ddl

    def streamReader(self, schema):
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return RestStreamReader(self.options, fields)


def register(spark) -> None:
    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(spark)
    spark.dataSource.register(RestStreamDataSource)
