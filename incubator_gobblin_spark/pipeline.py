"""Pipeline: the reference's task dataflow as one lazy DataFrame plan.

Reference lifecycle being reproduced (gobblin-runtime
.../runtime/Task.java:420 runSynchronousModel + AbstractJobLauncher
.../runtime/AbstractJobLauncher.java:396):

    extract -> convert* -> row-quality-check -> fork -> write -> publish
    with watermark state persisted after commit.

Spark-first collapse: extract/convert/quality become one lazy plan that
Catalyst optimizes end-to-end (predicate pushdown through the converter
chain into the scan); fork becomes cache-once-write-N; publish stays
engine code (staged atomic rename after task policies); the state store
records the committed high watermark for the next incremental run.

The builder mirrors EmbeddedGobblin (gobblin-runtime
.../runtime/embedded/EmbeddedGobblin.java:121) as the primary API:

    Pipeline(spark)
      .source(lambda s: read_parquet(s, path))
      .watermark("l_shipdate", state_store=store, table="lineitem")
      .convert(project([...]), filter_expr(...))
      .quality(RowPolicy("non_null", col.isNotNull(), PolicyType.ERR_FILE))
      .sink(FileSink(path=out, partition_by=["dt"]))
      .run()
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from incubator_gobblin_spark.operators.converters import Transform
from incubator_gobblin_spark.operators.quality import (
    PolicyType,
    QualityResult,
    RowCountPolicy,
    RowPolicy,
    TaskPolicyError,
    check_rows,
)
from incubator_gobblin_spark.formats.avro_ocf import resolve_format
from incubator_gobblin_spark.operators.watermark import WatermarkInterval, high_watermark
from incubator_gobblin_spark.sinks.files import FileSink, new_run_id
from incubator_gobblin_spark.state import StateStore, TableState


@dataclass
class ForkBranch:
    """One fork branch: its own converter chain + sink (the reference's
    per-branch converter/quality/writer stack — gobblin-runtime
    .../runtime/fork/Fork.java:92)."""

    name: str
    sink: FileSink
    transforms: Sequence[Transform] = field(default_factory=tuple)
    row_policies: Sequence[RowPolicy] = field(default_factory=tuple)


@dataclass
class RunResult:
    run_id: str
    rows_written: int
    published_paths: list[str]
    error_path: str | None
    high_watermark: object | None
    branch_rows: dict[str, int] = field(default_factory=dict)


class Pipeline:
    """Source -> converters -> quality -> (fork) -> sink -> publish."""

    def __init__(self, spark: SparkSession, name: str = "pipeline"):
        self.spark = spark
        self.name = name
        self._source: Callable[[SparkSession], DataFrame] | None = None
        self._transforms: list[Transform] = []
        self._row_policies: list[RowPolicy] = []
        self._task_policies: list[RowCountPolicy] = []
        self._sink: FileSink | None = None
        self._branches: list[ForkBranch] = []
        self._wm_column: str | None = None
        self._state_store: StateStore | None = None
        self._state_table: str | None = None
        self._wm_high: object | None = None
        self._wm_obs: Observation | None = None
        self._metrics_reporter = None

    # -- builder -----------------------------------------------------------
    def source(self, fn: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        self._source = fn
        return self

    def source_df(self, df: DataFrame) -> "Pipeline":
        self._source = lambda _s: df
        return self

    def watermark(
        self,
        column: str,
        state_store: StateStore,
        table: str,
        high: object | None = None,
    ) -> "Pipeline":
        """Incremental read: low watermark comes from the committed state
        of the previous run (low-exclusive); ``high`` optionally caps
        this run (high-inclusive); after publish the observed max is
        committed back (QueryBasedSource.getWorkunits:170 semantics)."""
        self._wm_column = column
        self._state_store = state_store
        self._state_table = table
        self._wm_high = high
        return self

    def convert(self, *transforms: Transform) -> "Pipeline":
        self._transforms.extend(transforms)
        return self

    def quality(self, *policies: RowPolicy) -> "Pipeline":
        self._row_policies.extend(policies)
        return self

    def task_policy(self, *policies: RowCountPolicy) -> "Pipeline":
        self._task_policies.extend(policies)
        return self

    def sink(self, sink: FileSink) -> "Pipeline":
        self._sink = sink
        return self

    def metrics(self, reporter) -> "Pipeline":
        """Attach a metrics reporter (gobblin-metrics emission surface,
        metrics.FileMetricsReporter): every run emits one scrapable
        event with rows, duration, watermark, and publish status."""
        self._metrics_reporter = reporter
        return self

    def fork(self, *branches: ForkBranch) -> "Pipeline":
        """Multiplex the post-quality stream into N branches, each with
        its own converters/policies/sink (ForkOperator,
        gobblin-api .../fork/ForkOperator.java:36). Implemented as
        persist-once-write-N: one source evaluation, N write jobs."""
        self._branches.extend(branches)
        return self

    # -- plan --------------------------------------------------------------
    def dataframe(self) -> tuple[DataFrame, QualityResult | None]:
        """Build the lazy plan up to (and including) row-quality checks.
        No action is triggered."""
        if self._source is None:
            raise ValueError("pipeline has no source")
        df = self._source(self.spark)
        if self._wm_column and self._state_store is not None:
            prev = self._state_store.get(self._state_table or self.name)
            interval = WatermarkInterval(
                column=self._wm_column, low=prev.high_watermark, high=self._wm_high
            )
            df = interval.apply(df)
            # the observed max rides the write action — no second source
            # scan to learn the committed high watermark
            self._wm_obs = Observation(f"{self.name}_wm")
            df = df.observe(
                self._wm_obs, F.max(F.col(self._wm_column)).alias("hwm")
            )
        for t in self._transforms:
            df = t(df)
        quality = None
        if self._row_policies:
            quality = check_rows(df, list(self._row_policies))
            df = quality.passed
        return df, quality

    # -- execute -----------------------------------------------------------
    def run(self, run_id: str | None = None) -> RunResult:
        import time as _time

        t0 = _time.perf_counter()
        run_id = run_id or new_run_id()
        try:
            result = self._run_inner(run_id)
        except Exception as e:
            self._emit_metrics(run_id, None, _time.perf_counter() - t0, error=repr(e))
            raise
        self._emit_metrics(run_id, result, _time.perf_counter() - t0)
        return result

    def _emit_metrics(self, run_id, result, secs, error: str | None = None) -> None:
        if self._metrics_reporter is None:
            return
        event = {
            "event": "pipeline_run",
            "pipeline": self.name,
            "run_id": run_id,
            "duration_sec": round(secs, 3),
            "status": "failed" if error else "committed",
        }
        if error:
            event["error"] = error
        else:
            event["rows_written"] = result.rows_written
            event["published_paths"] = len(result.published_paths)
            if result.high_watermark is not None:
                event["high_watermark"] = str(result.high_watermark)
            if result.branch_rows:
                event["branch_rows"] = result.branch_rows
        self._metrics_reporter.emit(event)

    def _run_inner(self, run_id: str) -> RunResult:
        df, quality = self.dataframe()

        if self._branches:
            return self._run_forked(df, quality, run_id)
        if self._sink is None:
            raise ValueError("pipeline has no sink")

        # Stage the output; the write action is also the count action.
        self._sink.write_staging(df, run_id)
        # Count from staged files: no recomputation of the source plan.
        staged = self.spark.read.format(resolve_format(self._sink.fmt)).load(
            self._sink.staging_dir(run_id)
        )
        rows = staged.count()

        try:
            self._enforce_task_policies(rows)
        except TaskPolicyError:
            self._sink.abort(run_id)
            raise

        err_path = None
        if quality is not None and quality.errors is not None:
            err_path = self._sink.write_errors(quality.errors, run_id)

        published = self._sink.publish(run_id)
        hwm = self._commit_watermark(df, run_id)
        return RunResult(
            run_id=run_id,
            rows_written=rows,
            published_paths=published,
            error_path=err_path,
            high_watermark=hwm,
        )

    def _run_forked(
        self, df: DataFrame, quality: QualityResult | None, run_id: str
    ) -> RunResult:
        """Cache once, write each branch (records may go to multiple
        branches — the Copyable contract is free here since DataFrames
        are immutable). Publish is all-or-nothing across branches
        (COMMIT_ON_FULL_SUCCESS, gobblin-core-base
        .../extractor/JobCommitPolicy.java:31-46)."""
        df = df.persist()
        branch_rows: dict[str, int] = {}
        try:
            for br in self._branches:
                bdf = df
                for t in br.transforms:
                    bdf = t(bdf)
                if br.row_policies:
                    bq = check_rows(bdf, list(br.row_policies))
                    bdf = bq.passed
                br.sink.write_staging(bdf, run_id)
                branch_rows[br.name] = (
                    self.spark.read.format(resolve_format(br.sink.fmt))
                    .load(br.sink.staging_dir(run_id))
                    .count()
                )
            total = sum(branch_rows.values())
            try:
                self._enforce_task_policies(total)
            except TaskPolicyError:
                for br in self._branches:
                    br.sink.abort(run_id)
                raise
            published: list[str] = []
            for br in self._branches:
                published.extend(br.sink.publish(run_id))
            err_path = None
            if quality is not None and quality.errors is not None and self._branches:
                err_path = self._branches[0].sink.write_errors(quality.errors, run_id)
            hwm = self._commit_watermark(df, run_id)
            return RunResult(
                run_id=run_id,
                rows_written=total,
                published_paths=published,
                error_path=err_path,
                high_watermark=hwm,
                branch_rows=branch_rows,
            )
        finally:
            df.unpersist()

    def _enforce_task_policies(self, actual_rows: int) -> None:
        failures = [
            p.name
            for p in self._task_policies
            if p.type == PolicyType.FAIL and not p.check(actual_rows)
        ]
        if failures:
            raise TaskPolicyError(failures)

    def _commit_watermark(self, df: DataFrame, run_id: str) -> object | None:
        if not (self._wm_column and self._state_store is not None):
            return None
        if self._wm_obs is not None:
            hwm = self._wm_obs.get.get("hwm")
        else:  # pragma: no cover - observation always attached with wm
            hwm = high_watermark(df, self._wm_column)
        if hwm is None:  # empty increment: keep previous watermark
            prev = self._state_store.get(self._state_table or self.name)
            hwm = prev.high_watermark
        self._state_store.commit(
            self._state_table or self.name,
            TableState(high_watermark=hwm, last_run_id=run_id),
        )
        return hwm
