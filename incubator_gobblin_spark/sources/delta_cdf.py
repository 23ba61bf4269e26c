"""Delta Lake CHANGE DATA FEED read — replay the row-level changes a
table recorded between two versions (delta-io PROTOCOL.md §Add CDC
File / §Change Data Files; delta-spark's ``table_changes`` /
CDCReader semantics).

Contract per commit in the requested interval:

- Commits carrying ``cdc`` actions describe ALL their row changes in
  ``_change_data`` parquet files (table columns + ``_change_type`` of
  ``insert`` / ``update_preimage`` / ``update_postimage`` /
  ``delete``); their ``add``/``remove`` actions are IGNORED for CDF —
  a DV rewrite re-adds the same path, so deriving from them would
  fabricate delete+insert pairs for untouched rows.
- Commits without ``cdc`` actions derive: every ``add`` with
  ``dataChange=true`` contributes its rows as ``insert``; every
  ``remove`` with ``dataChange=true`` contributes the rows live in
  that file as of the PREVIOUS version (its standing deletion vector
  applied) as ``delete``. A commit that both removes and re-adds the
  same path (or adds a file carrying a deletion vector) without cdc
  actions is NOT derivable — the writer violated the protocol's CDF
  obligation, and the read refuses exactly like delta-spark's
  "change data was not recorded" error rather than fabricating
  changes.
- ``dataChange=false`` traffic (OPTIMIZE, checkpoint-era re-adds) is
  invisible to CDF.
- ``delta.enableChangeDataFeed`` must be true for EVERY version in
  the interval (checked against the metadata in effect at each
  commit, including a mid-interval metaData action).

Result columns: the table's declared columns + ``_change_type`` +
``_commit_version`` (long) + ``_commit_timestamp`` (long, epoch ms
from commitInfo).

Reference parity: the CDC consumption half of the reference's
kafka-common ingestion flows (gobblin-modules/gobblin-kafka-common,
ChangeDataFeed-style replication sources); the wire format is public
delta-io PROTOCOL.md.

Scale shape: pure driver-side JSON metadata to plan (O(commits) in
the interval, never O(rows)); the data path is one grouped parquet
scan per (version, change kind) unioned, partition values restored as
typed literals through the same ``assemble_snapshot`` the snapshot
reader uses, and deletion-vector bitmaps decode executor-side.
"""

from __future__ import annotations

import json
import os
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from incubator_gobblin_spark.sources.delta_import import (
    _log_versions,
    _replay_state,
    add_file_path,
    assemble_snapshot,
    check_reader_protocol,
)

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"
COMMIT_TIMESTAMP_COL = "_commit_timestamp"


def _commit_actions(log_dir: str, v: int) -> list[dict]:
    with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _cdf_on(meta: dict | None) -> bool:
    conf = (meta or {}).get("configuration") or {}
    return str(conf.get("delta.enableChangeDataFeed", "")).lower() == "true"


def _groups_of(path: str, files: list[dict], pv_keys: list[str]):
    groups: dict[tuple, list[str]] = {}
    for a in files:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(k) for k in pv_keys)
        groups.setdefault(key, []).append(add_file_path(path, a["path"]))
    return groups


#: Default per-call version-interval bound — the CDF plan unions one
#: frame set per commit, so plan size is linear in interval length;
#: past the bound the read refuses with chunking guidance (the same
#: rule as iceberg_changelog.MAX_SNAPSHOTS_PER_CALL).
MAX_VERSIONS_PER_CALL = 64


def plan_changes(
    path: str,
    starting_version: int,
    ending_version: int | None = None,
    max_versions: int = MAX_VERSIONS_PER_CALL,
) -> tuple[list[tuple[int, int, str, list]], dict]:
    """Driver-side CDF planning shared by the batch reader and the
    ``deltastream`` CDF mode: walk commits ``starting_version ..
    ending_version`` and return ``(plan, metaData)`` where each plan
    entry is ``(version, timestamp_ms, kind, payload)``:

    - kind ``"cdc"``: payload = the commit's cdc actions,
    - kind ``"insert"``: payload = dataChange add actions,
    - kind ``"delete"``: payload = [(remove action, standing deletion
      vector descriptor of that path as of version-1 or None)].

    Raises exactly where delta-spark's CDC reader does: interval not
    CDF-enabled, expired commits, non-derivable cdc-less rewrites."""
    log_dir = os.path.join(path, "_delta_log")
    versions = _log_versions(log_dir)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {log_dir}")
    end = versions[-1] if ending_version is None else int(ending_version)
    start = int(starting_version)
    if start > end:
        raise ValueError(
            f"read_delta_changes: starting_version {start} > "
            f"ending_version {end}"
        )
    if end > versions[-1]:
        raise ValueError(
            f"read_delta_changes: ending_version {end} beyond the "
            f"table's current version {versions[-1]}"
        )
    if end - start + 1 > max_versions:
        raise ValueError(
            f"read_delta_changes: the requested interval spans "
            f"{end - start + 1} versions (> max_versions="
            f"{max_versions}) — the CDF plan is linear in interval "
            "length, so a deep backlog must be consumed in CHUNKS: "
            "call repeatedly with intermediate ending_version values "
            "(the replication jobs in jobs/replicate.py do this "
            "automatically), or raise max_versions deliberately if "
            "the plan size is acceptable"
        )
    missing = [v for v in range(start, end + 1) if v not in set(versions)]
    if missing:
        raise FileNotFoundError(
            f"read_delta_changes: commit JSON for versions {missing} "
            "was expired from the log — change data for them is no "
            "longer readable"
        )

    # state (live adds) + metadata as of start-1 — the remove-derived
    # deletes need each removed file's standing DV, and the metadata
    # walk needs a base to apply mid-interval metaData actions to
    if start > 0:
        if (start - 1) in set(versions) or os.path.exists(
            os.path.join(log_dir, "_last_checkpoint")
        ):
            prev_live, meta, proto = _replay_state(log_dir, start - 1)
        else:
            raise FileNotFoundError(
                f"read_delta_changes: version {start - 1} (the state "
                "base for the requested interval) was expired from "
                "the log and no checkpoint covers it"
            )
        check_reader_protocol(proto, meta, prev_live, allow_column_mapping=True)
    else:
        prev_live, meta, proto = {}, None, {}

    # ---- plan: walk the interval, classify each commit ----
    # each entry: (version, ts, kind, payload)
    #   kind "cdc":    payload = list of cdc actions
    #   kind "insert": payload = list of add actions
    #   kind "delete": payload = list of (remove action, standing DV
    #                  descriptor of that path as of v-1 or None)
    plan: list[tuple[int, int, str, list]] = []
    for v in range(start, end + 1):
        acts = _commit_actions(log_dir, v)
        ts = None
        for a in acts:
            if "commitInfo" in a:
                ts = a["commitInfo"].get("timestamp")
            elif "metaData" in a:
                if meta is not None and a["metaData"].get(
                    "schemaString"
                ) != meta.get("schemaString"):
                    # delta-spark's CDC read errors on a schema change
                    # inside the interval; silently reading older
                    # change files under the new schema would null-fill
                    # renamed/added columns instead
                    raise ValueError(
                        "read_delta_changes: the table schema changed "
                        f"at version {v}, inside the requested interval "
                        "— read the feed in two calls split at that "
                        "version"
                    )
                meta = a["metaData"]
            elif "protocol" in a:
                proto = a["protocol"]
        # the interval's protocol (v0's creating action when start=0,
        # or a mid-interval upgrade) must pass the reader gate — a
        # table requiring reader features this engine doesn't
        # implement would otherwise be misread instead of refused
        if any("protocol" in a for a in acts) or (
            v == start and start == 0
        ):
            check_reader_protocol(
                proto, meta or {}, prev_live, allow_column_mapping=True
            )
        if ts is None:
            ts = int(
                os.path.getmtime(os.path.join(log_dir, f"{v:020d}.json"))
                * 1000
            )
        if meta is None:
            raise ValueError(
                f"read_delta_changes: no metaData visible at version {v}"
            )
        if not _cdf_on(meta):
            raise ValueError(
                "read_delta_changes: delta.enableChangeDataFeed is not "
                f"set for version {v} — change data was not recorded "
                "for part of the requested interval"
            )
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        adds = [
            a["add"]
            for a in acts
            if "add" in a and a["add"].get("dataChange")
        ]
        removes = [
            a["remove"]
            for a in acts
            if "remove" in a and a["remove"].get("dataChange")
        ]
        if cdc:
            plan.append((v, ts, "cdc", cdc))
        elif adds or removes:
            re_added = {a["path"] for a in adds} & {
                r["path"] for r in removes
            }
            dv_adds = [a for a in adds if a.get("deletionVector")]
            if re_added or dv_adds:
                raise ValueError(
                    f"read_delta_changes: version {v} rewrites files "
                    "(re-add or deletion-vector add) without cdc "
                    "actions — its row changes are not derivable; "
                    "change data was not recorded for this commit"
                )
            if removes:
                # a remove action's partitionValues is OPTIONAL
                # (PROTOCOL.md: extendedFileMetadata=false omits it) —
                # the standing add in prev_live carries the true
                # values; without them a partitioned table's derived
                # deletes would null-fill their partition columns
                def _with_pv(r: dict) -> dict:
                    if r.get("partitionValues"):
                        return r
                    pv = (prev_live.get(r["path"]) or {}).get(
                        "partitionValues"
                    )
                    return {**r, "partitionValues": pv or {}}

                plan.append(
                    (
                        v,
                        ts,
                        "delete",
                        [
                            (
                                _with_pv(r),
                                (prev_live.get(r["path"]) or {}).get(
                                    "deletionVector"
                                ),
                            )
                            for r in removes
                        ],
                    )
                )
            if adds:
                plan.append((v, ts, "insert", adds))
        # advance the state to v (ALL adds/removes, dataChange or not)
        for a in acts:
            if "add" in a:
                prev_live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                prev_live.pop(a["remove"]["path"], None)
    return plan, meta


def read_delta_changes(
    spark: SparkSession,
    path: str,
    starting_version: int,
    ending_version: int | None = None,
    union_threshold: int = 16,
    max_versions: int = MAX_VERSIONS_PER_CALL,
) -> DataFrame:
    """Read the change data feed of the Delta table at ``path`` for
    commits ``starting_version .. ending_version`` (inclusive;
    default = current version). See the module docstring for the
    exact protocol contract this implements."""
    plan, meta = plan_changes(
        path, starting_version, ending_version, max_versions
    )
    schema_json = json.loads(meta["schemaString"])
    logical_part_cols = list(meta.get("partitionColumns") or [])
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode == "name":
        # column mapping (PROTOCOL.md §Column Mapping): data files,
        # cdc files, and partitionValues are all keyed by PHYSICAL
        # name — read physical, rename back to logical last (the
        # read_delta shape); _change_type itself is never mapped
        from incubator_gobblin_spark.sources.delta_import import (
            _cm_phys,
            _logical_expr,
            _physicalize_type,
        )

        table_schema = StructType.fromJson(_physicalize_type(schema_json))
        phys_of = {f["name"]: _cm_phys(f) for f in schema_json["fields"]}
        part_cols = [phys_of[c] for c in logical_part_cols]
        pv_keys = part_cols

        def _finish(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    _logical_expr(F.col(_cm_phys(f)), f["type"]).alias(
                        f["name"]
                    )
                    for f in schema_json["fields"]
                ],
                CHANGE_TYPE_COL,
                COMMIT_VERSION_COL,
                COMMIT_TIMESTAMP_COL,
            )

    elif mode == "id":
        # columnMapping mode=id: data AND cdc parquet carry field ids
        # (physical names on disk); the read schema keeps LOGICAL
        # names tagged with parquet.field.id so Spark's native
        # field-id matching resolves the columns inside the scan.
        # _change_type itself is never mapped and carries no id — a
        # requested field WITHOUT an id falls back to name matching,
        # so it resolves alongside the id-tagged table columns.
        # partitionValues stay keyed by PHYSICAL name (the protocol's
        # rule in both modes) — grouping keys use pv_keys while the
        # restored column keeps its logical schema name.
        from incubator_gobblin_spark.session import ensure_field_id_read
        from incubator_gobblin_spark.sources.delta_import import (
            _cm_phys,
            _fieldid_type,
        )

        ensure_field_id_read(spark)
        table_schema = StructType.fromJson(_fieldid_type(schema_json))
        phys_of = {f["name"]: _cm_phys(f) for f in schema_json["fields"]}
        part_cols = list(logical_part_cols)
        pv_keys = [phys_of[c] for c in logical_part_cols]

        def _finish(df: DataFrame) -> DataFrame:
            return df

    else:
        table_schema = StructType.fromJson(schema_json)
        part_cols = logical_part_cols
        pv_keys = part_cols

        def _finish(df: DataFrame) -> DataFrame:
            return df

    out_schema = StructType(
        list(table_schema.fields)
        + [StructField(CHANGE_TYPE_COL, StringType())]
    )
    out_cols = [f.name for f in table_schema.fields] + [
        CHANGE_TYPE_COL,
        COMMIT_VERSION_COL,
        COMMIT_TIMESTAMP_COL,
    ]

    def _stamp(df: DataFrame, v: int, ts: int) -> DataFrame:
        return (
            df.withColumn(COMMIT_VERSION_COL, F.lit(v).cast("long"))
            .withColumn(COMMIT_TIMESTAMP_COL, F.lit(ts).cast("long"))
            .select(*out_cols)
        )

    frames: list[DataFrame] = []
    table_root = os.path.abspath(path)
    for v, ts, kind, payload in plan:
        if kind == "cdc":
            # cdc files carry _change_type IN the file
            df = assemble_snapshot(
                spark,
                _groups_of(path, payload, pv_keys),
                out_schema,
                part_cols,
                union_threshold,
            )
            frames.append(_stamp(df, v, ts))
        elif kind == "insert":
            df = assemble_snapshot(
                spark,
                _groups_of(path, payload, pv_keys),
                table_schema,
                part_cols,
                union_threshold,
            ).withColumn(CHANGE_TYPE_COL, F.lit("insert"))
            frames.append(_stamp(df, v, ts))
        else:  # delete: removed files' live rows as of v-1
            plain = [r for r, dv in payload if not dv]
            dvd = [(r, dv) for r, dv in payload if dv]
            if plain:
                df = assemble_snapshot(
                    spark,
                    _groups_of(path, plain, pv_keys),
                    table_schema,
                    part_cols,
                    union_threshold,
                ).withColumn(CHANGE_TYPE_COL, F.lit("delete"))
                frames.append(_stamp(df, v, ts))
            if dvd:
                from incubator_gobblin_spark.sinks.delta_delete import (
                    _anti_join_existing_dvs,
                )

                df = assemble_snapshot(
                    spark,
                    _groups_of(path, [r for r, _ in dvd], pv_keys),
                    table_schema,
                    part_cols,
                    union_threshold,
                    with_positions=True,
                )
                df = _anti_join_existing_dvs(
                    spark,
                    df,
                    table_root,
                    [
                        (
                            os.path.abspath(
                                add_file_path(path, r["path"])
                            ),
                            json.dumps(dv),
                        )
                        for r, dv in dvd
                    ],
                ).withColumn(CHANGE_TYPE_COL, F.lit("delete"))
                frames.append(_stamp(df, v, ts))

    if not frames:
        # empty frames come back in LOGICAL shape, mapped tables too
        return spark.createDataFrame(
            [],
            StructType(
                list(StructType.fromJson(schema_json).fields)
                + [
                    StructField(CHANGE_TYPE_COL, StringType()),
                    StructField(COMMIT_VERSION_COL, LongType()),
                    StructField(COMMIT_TIMESTAMP_COL, LongType()),
                ]
            ),
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return _finish(out)


def read_delta_changes_chunked(
    spark: SparkSession,
    path: str,
    starting_version: int,
    ending_version: int | None = None,
    *,
    chunk_versions: int = MAX_VERSIONS_PER_CALL,
    union_threshold: int = 16,
):
    """Deep-backlog ergonomics for the CDF read (the
    read_iceberg_changelog_chunked sibling): iterate a version
    interval of ANY depth as bounded chunks instead of refusing past
    ``max_versions``. Yields ``(info, DataFrame)`` oldest-first with
    ``info = {"starting_version", "ending_version", "versions"}``;
    ``ending_version`` is the inclusive chunk watermark a consumer
    commits AFTER applying the chunk, and restarting with
    ``watermark + 1`` as ``starting_version`` resumes on exactly the
    un-applied suffix. ``_commit_version`` is globally monotonic, so
    no per-chunk rebasing is needed — concatenating every chunk equals
    one unbounded call."""
    if chunk_versions <= 0:
        raise ValueError(
            "read_delta_changes_chunked: chunk_versions must be "
            f"positive, got {chunk_versions}"
        )
    log_dir = os.path.join(path, "_delta_log")
    versions = _log_versions(log_dir)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {log_dir}")
    end = versions[-1] if ending_version is None else int(ending_version)
    start = int(starting_version)
    if start > end:
        return
    for lo in range(start, end + 1, chunk_versions):
        hi = min(lo + chunk_versions - 1, end)
        yield (
            {
                "starting_version": lo,
                "ending_version": hi,
                "versions": hi - lo + 1,
            },
            read_delta_changes(
                spark,
                path,
                lo,
                hi,
                union_threshold=union_threshold,
                max_versions=chunk_versions,
            ),
        )
