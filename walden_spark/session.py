"""SparkSession factory (SURVEY.md §7.1 M0).

Mirrors the reference deployment's storage/session wiring — MinIO S3
endpoint + path-style access (reference: tf/nessie-values.yaml:14-22),
warehouse-dir-on-bucket (tf/nessie-values.yaml:8-13) — as Spark conf,
and bakes in the scale posture from SURVEY.md §4: AQE on (runtime join
re-plan, skew-join splitting, partition coalescing), ANSI mode for
Trino-like strict semantics, Arrow for the Python boundary.

Design-for-100TB notes
----------------------
* ``shuffle_partitions`` defaults to the local core count; on a real
  cluster set it to 2-3x total executor cores (or rely on AQE's
  coalescing with a high initial value).
* ``spark.sql.files.maxPartitionBytes`` stays at the 128MB default —
  matched to the 128MB Parquet target file size we write (see
  catalog.write_table), so one scan task ~ one row-group run.
* AQE skew-join is enabled so a hot join key is split at runtime;
  skewed *aggregations* get the two-phase salting helper
  (operators/skew.py::salted_agg).
"""

from __future__ import annotations

import os
import re as _re_mod
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "walden_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    s3_endpoint: str | None = None,
    s3_access_key: str | None = None,
    s3_secret_key: str | None = None,
    warehouse_dir: str | None = None,
    persistent_catalog: bool = False,
    metastore_dir: str | None = None,
    metastore_uri: str | None = None,
    fair_scheduling: bool = False,
    rocksdb_state: bool = False,
    extra_conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    S3A options reproduce the reference's MinIO client settings
    (endpoint, path-style access, static credentials); on AWS-native
    deployments simply omit them and the default credential chain
    applies.

    ``persistent_catalog=True`` switches from Spark's session-scoped
    in-memory catalog to a Hive metastore so schemas/tables OUTLIVE the
    engine process — the reference's defining catalog-service trait
    (Nessie+Postgres, tf/main.tf:34-60, or the legacy Hive metastore,
    docker/metastore/Dockerfile:6-27; VERDICT r01 "What's missing" #1).
    Default backing store is embedded Derby at ``metastore_dir`` (single
    engine instance — the dev/test analog of the reference's bundled
    metastore); point ``metastore_uri`` at a thrift metastore service
    for the multi-engine production shape. A BI client connecting over
    Thrift after an engine restart sees the same catalog.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    # pip-installed pyspark defaults spark.driver.memory to 1g; in local
    # mode the driver heap IS the executor heap, so broadcasts + agg
    # hash maps at bench scale (sf>=1) hit "not enough memory to build
    # and broadcast" long before the machine is full. Must be set at
    # JVM launch — no-op via getOrCreate on a live session.
    driver_memory = os.environ.get("WALDEN_DRIVER_MEMORY", "8g")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")  # use ANALYZE stats (EXPLAIN COST)
        # cbo.enabled alone never reorders joins — the reorder rule has
        # its own flag (r08; verified: a pessimal fact⋈fact⋈dim order
        # only flips to fact⋈dim-first with this on). This is the
        # stats-driven join ordering Trino's CBO gives the reference;
        # plan-gated in test_plans.py::test_cbo_reorders_pessimal_join.
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark's default INT96 timestamps carry NO parquet statistics,
        # killing row-group/file skipping on every time column; int64
        # micros is the modern layout every engine reads and stats-prunes
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Runtime bloom-filter join pruning — the non-partition-key
        # analog of dynamic partition pruning (together they cover what
        # the reference gets from Trino's dynamic filtering): a
        # selective dim-side predicate builds a bloom filter that
        # pre-filters the fact scan before the shuffle. The
        # application-side threshold (default 10GB) keeps it
        # big-data-only in production; tests lower it to observe the
        # rewrite (tests/test_plans.py::test_runtime_bloom_filter).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", os.environ.get("WALDEN_SPARK_UI", "false"))
    )
    if s3_endpoint:
        # reference: tf/nessie-values.yaml:14-22 (MinIO endpoint,
        # path-style access, secret-based credentials)
        b = (
            b.config("spark.hadoop.fs.s3a.endpoint", s3_endpoint)
            .config("spark.hadoop.fs.s3a.path.style.access", "true")
            .config("spark.hadoop.fs.s3a.connection.ssl.enabled", "false")
        )
    if s3_access_key:
        b = b.config("spark.hadoop.fs.s3a.access.key", s3_access_key)
    if s3_secret_key:
        b = b.config("spark.hadoop.fs.s3a.secret.key", s3_secret_key)
    if warehouse_dir:
        # reference: Nessie default warehouse s3://demobucket/
        b = b.config("spark.sql.warehouse.dir", warehouse_dir)
    if fair_scheduling:
        # BI-concurrency mode (the reference's Trino serves many
        # dashboard queries at once): FAIR scheduling lets short
        # queries overtake long scans instead of FIFO head-of-line
        # blocking. Threads opt into pools via
        # sc.setLocalProperty("spark.scheduler.pool", name).
        # Must be set at JVM launch — no-op via getOrCreate on a live
        # session.
        b = b.config("spark.scheduler.mode", "FAIR")
    if rocksdb_state:
        # Large-state streaming mode: RocksDB state store spills
        # per-partition state to local disk instead of holding it on
        # the JVM heap — the production knob when stateful operators
        # (sessionization, stream-stream joins, dropDuplicates
        # horizons) accumulate state beyond executor memory at corpus
        # scale. Changelog checkpointing ships per-batch deltas to the
        # checkpoint location rather than full snapshots.
        b = (
            b.config(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            )
            .config(
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true",
            )
        )
    if persistent_catalog or metastore_uri:
        b = b.config("spark.sql.catalogImplementation", "hive").enableHiveSupport()
        if metastore_uri:
            # external metastore service (reference's catalog-service
            # role: one metadata store shared by many engines)
            b = b.config("spark.hadoop.hive.metastore.uris", metastore_uri)
        else:
            mdir = metastore_dir or os.path.join(os.getcwd(), "metastore_db")
            b = b.config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={mdir};create=true",
            )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


class WaldenSession:
    """Thin engine facade — parity with the reference's client surface.

    The reference exposes: a SQL CLI (trino-cli wrapper,
    docker/devserver/Dockerfile:24-26), a Python DBAPI client, and a
    SQLAlchemy URI for BI. Here: ``sql()`` is the Python API, and the
    Spark Thrift JDBC server (plans/serving.py) covers BI clients.
    """

    # Trino/Iceberg time-travel syntax over registered versioned tables:
    #   SELECT ... FROM t FOR VERSION AS OF 3
    #   SELECT ... FROM t FOR VERSION AS OF 'branch-or-tag'
    #   SELECT ... FROM t FOR TIMESTAMP AS OF TIMESTAMP '2024-01-01 00:00:00'
    import re as _re

    _TT_RE = _re.compile(
        r"\b(\w+)\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
        r"(?:TIMESTAMP\s+)?('[^']*'|[\w\-]+)",
        _re.IGNORECASE,
    )
    # Trino-on-Iceberg DML over registered versioned tables (the
    # reference enables allow_dml through SQL; here every statement
    # commits a merge-on-read snapshot)
    _DML_DELETE_RE = _re.compile(
        r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$", _re.IGNORECASE | _re.DOTALL
    )
    _DML_UPDATE_RE = _re.compile(
        r"^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$",
        _re.IGNORECASE | _re.DOTALL,
    )
    _DML_INSERT_RE = _re.compile(
        r"^\s*INSERT\s+INTO\s+(\w+)\s+((?:SELECT|VALUES)\s+.+?)\s*;?\s*$",
        _re.IGNORECASE | _re.DOTALL,
    )
    _DDL_RENAME_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$",
        _re.IGNORECASE,
    )
    _DDL_ADD_COL_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+"
        r"([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
        r"(?:\s+DEFAULT\s+(.+?))?\s*;?\s*$",
        _re.IGNORECASE,
    )
    _DDL_DROP_COL_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$",
        _re.IGNORECASE,
    )
    _DDL_WIDEN_COL_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+"
        r"([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*$",
        _re.IGNORECASE,
    )
    _DML_MERGE_RE = _re.compile(
        r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?"
        r"\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
        r"\s+ON\s+(.+?)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*"
        r"(\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?\s*;?\s*$",
        _re.IGNORECASE | _re.DOTALL,
    )
    # MERGE ... WHEN MATCHED THEN DELETE — the CDC-apply shape (a
    # change stream whose matched keys are retractions)
    _DML_MERGE_DEL_RE = _re.compile(
        r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?"
        r"\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
        r"\s+ON\s+(.+?)\s+WHEN\s+MATCHED\s+THEN\s+DELETE\s*;?\s*$",
        _re.IGNORECASE | _re.DOTALL,
    )
    # MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE — the full-sync
    # shape (rows whose key vanished from the source are removed)
    _DML_MERGE_SYNC_RE = _re.compile(
        r"^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?"
        r"\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?"
        r"\s+ON\s+(.+?)\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE\s*;?\s*$",
        _re.IGNORECASE | _re.DOTALL,
    )
    # Delta/Trino-style maintenance statements on versioned tables
    _MAINT_OPTIMIZE_RE = _re.compile(
        r"^\s*OPTIMIZE\s+(\w+)"
        r"(?:\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\)|\s+(MANIFESTS))?\s*;?\s*$",
        _re.IGNORECASE,
    )
    _MAINT_VACUUM_RE = _re.compile(
        r"^\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$",
        _re.IGNORECASE,
    )
    _MAINT_HISTORY_RE = _re.compile(
        r"^\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*$", _re.IGNORECASE
    )
    _MAINT_DETAIL_RE = _re.compile(
        r"^\s*DESCRIBE\s+DETAIL\s+(\w+)\s*;?\s*$", _re.IGNORECASE
    )
    _MAINT_STATS_RE = _re.compile(
        r"^\s*SHOW\s+STATS\s+FOR\s+(\w+)\s*;?\s*$", _re.IGNORECASE
    )
    _MAINT_RESTORE_RE = _re.compile(
        r"^\s*RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$",
        _re.IGNORECASE,
    )
    # Iceberg branch/tag DDL: ALTER TABLE t CREATE BRANCH b [AS OF
    # VERSION n] / CREATE TAG g [AS OF VERSION n] / DROP BRANCH b /
    # DROP TAG g, plus the merge statement Iceberg spells as a
    # procedure: ALTER TABLE t MERGE BRANCH b [KEYS (a, b)]
    _MAINT_REF_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+(CREATE|DROP)\s+(BRANCH|TAG)\s+(\w+)"
        r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
        _re.IGNORECASE,
    )
    _MAINT_MERGE_BRANCH_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+MERGE\s+BRANCH\s+(\w+)"
        r"(?:\s+KEYS\s*\(\s*([\w\s,]+?)\s*\))?\s*;?\s*$",
        _re.IGNORECASE,
    )
    # interop pair (r07): EXPORT TABLE t [VERSION AS OF n] TO 'dir'
    # materializes a resolved snapshot as plain parquet any engine
    # reads; ALTER TABLE t ADD FILES 'dir' is the Iceberg add_files /
    # Delta CONVERT import direction — zero-copy external-dir commit
    _MAINT_EXPORT_RE = _re.compile(
        r"^\s*EXPORT\s+TABLE\s+(\w+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
        r"\s+TO\s+'([^']+)'\s*;?\s*$",
        _re.IGNORECASE,
    )
    _MAINT_ADD_FILES_RE = _re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+FILES\s+'([^']+)'\s*;?\s*$",
        _re.IGNORECASE,
    )

    def __init__(self, spark: SparkSession | None = None, **kwargs):
        self.spark = spark or get_spark(**kwargs)
        from walden_spark.plans.serving import QueryLog

        self.query_log = QueryLog()
        self._versioned: dict[str, object] = {}
        self._txn: dict | None = None

    # ---- multi-statement transactions over versioned tables ----

    def transaction(self):
        """Multi-statement ACID transaction over registered versioned
        tables (the Nessie-refs transaction model): every DML inside
        the block stages on a per-table TRANSACTION BRANCH — main
        never sees intermediate state, while SELECTs inside the block
        read their own writes. On exit the commit is two-phase:
        every touched table is validated fast-forwardable first, then
        all pointers move; a concurrent commit on any table aborts
        the WHOLE transaction with nothing published (optimistic
        serializability, same claim protocol as single commits). An
        exception inside the block rolls everything back.

        >>> with ws.transaction():
        ...     ws.sql("DELETE FROM orders_v WHERE status = 'X'")
        ...     ws.sql("INSERT INTO audit_v VALUES (...)")
        """
        import contextlib
        import uuid as _uuid

        from walden_spark.timetravel import MergeConflictError

        @contextlib.contextmanager
        def _txn():
            if self._txn is not None:
                raise RuntimeError("transactions do not nest")
            name = f"txn_{_uuid.uuid4().hex[:12]}"
            self._txn = {"name": name, "tables": set()}
            # snapshot isolation: pin EVERY registered table's view at
            # its main head as of transaction start — a concurrent
            # commit mid-transaction never changes what this block
            # reads (touched tables then switch to their txn branch)
            for t in self._versioned:
                self._refresh_versioned(t)
            ok = False
            try:
                yield self
                # phase 1: every touched table must be fast-forwardable,
                # AND its main→txn-head transition CAS-claimed, BEFORE
                # any pointer moves — a single-statement commit landing
                # on main between the check and the publish now loses
                # the claim race instead of being silently orphaned
                # (same claim protocol as single commits; Nessie's
                # commit contract, reference tf/nessie-values.yaml:1-7)
                from walden_spark.timetravel import ConcurrentWriteError

                claims: list[tuple] = []  # (vt, claim_path, txn_head)
                published = 0
                try:
                    # sorted: deterministic validate/claim order, so a
                    # multi-table abort is reproducible in tests
                    for t in sorted(self._txn["tables"]):
                        vt = self._versioned[t]
                        src = vt.head(name)
                        dst = vt.head("main")
                        if dst == src:
                            continue  # nothing staged on this table
                        if dst not in vt._ancestors(src):
                            raise MergeConflictError(
                                f"table {t!r} was committed concurrently "
                                "during the transaction; nothing was "
                                "published — retry"
                            )
                        claims.append((vt, vt._cas_claim("main", dst, src), src))
                    # phase 2: publish all pointers (every transition is
                    # claimed, so each move is serialized against racers)
                    for vt, _, src in claims:
                        vt._write_ref("branch", "main", src, overwrite=True)
                        published += 1
                except BaseException as exc:
                    # release every claim that did NOT culminate in its
                    # pointer move — regardless of exception type (an
                    # IO error mid-claim would otherwise wedge those
                    # tables exactly like a crashed writer; ADVICE
                    # r06 #3). Claims whose pointer DID move are spent
                    # and must stay.
                    for cvt, c, _ in claims[published:]:
                        try:
                            cvt._cas_release(c)
                        except Exception:
                            pass  # repairable later via the stale-claim path
                    if isinstance(exc, ConcurrentWriteError):
                        raise MergeConflictError(
                            f"transaction publish lost a commit race: {exc}; "
                            "nothing was published — retry"
                        ) from exc
                    raise
                ok = True
            finally:
                txn, self._txn = self._txn, None
                for t in txn["tables"]:
                    vt = self._versioned[t]
                    try:
                        vt.delete_ref("branch", txn["name"])
                    except Exception:
                        pass  # branch cleanup is best-effort
                # un-pin EVERY view (untouched tables were snapshot-
                # pinned at txn start and may have moved since)
                for t in self._versioned:
                    self._refresh_versioned(t)
                if not ok:
                    pass  # staged branch commits dangle unreferenced;
                    # expire_versions / remove_orphans reclaim them

        return _txn()

    def _dml_branch(self, name: str) -> str:
        """Branch DML statements write to: main normally, the
        transaction branch (created at first touch) inside one."""
        if self._txn is None:
            return "main"
        vt = self._versioned[name]
        if name not in self._txn["tables"]:
            vt.create_branch(self._txn["name"])
            self._txn["tables"].add(name)
        return self._txn["name"]

    def register_versioned(self, name: str, path: str):
        """Expose a :class:`walden_spark.timetravel.VersionedTable` to
        SQL: its current snapshot becomes view ``name``, and
        ``FOR VERSION/TIMESTAMP AS OF`` in :meth:`sql` time-travels it
        (the reference's Trino-on-Iceberg `FOR VERSION AS OF` surface,
        with branch/tag names accepted as quoted versions — Nessie's
        ref-in-SQL idiom)."""
        from walden_spark.timetravel import VersionedTable

        vt = VersionedTable(self.spark, path)
        self._versioned[name] = vt
        vt.read(branch="main").createOrReplaceTempView(name)
        return vt

    def _rewrite_time_travel(self, query: str) -> str:
        def sub(m) -> str:
            name, kind, val = m.group(1), m.group(2).upper(), m.group(3)
            vt = self._versioned.get(name)
            if vt is None:
                return m.group(0)  # not a versioned table — leave as-is
            if kind == "TIMESTAMP":
                import datetime

                # naive literals are UTC: manifests record UTC unix
                # times and the session TZ is pinned to UTC — .timestamp()
                # on a naive datetime would use the HOST's local zone
                dt = datetime.datetime.fromisoformat(val.strip("'"))
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=datetime.timezone.utc)
                ts = dt.timestamp()
                df = vt.read_as_of(ts)
                view = f"{name}_asof_{int(ts)}"
            elif val.startswith("'"):
                ref = val.strip("'")
                refs = vt._read_refs()
                if ("branch", ref) in refs:
                    df = vt.read(branch=ref)
                elif ("tag", ref) in refs:
                    df = vt.read(tag=ref)
                else:
                    raise ValueError(f"unknown branch/tag {ref!r} for table {name!r}")
                safe = "".join(c if c.isalnum() else "_" for c in ref)
                view = f"{name}_ref_{safe}"
            else:
                df = vt.read(version=int(val))
                view = f"{name}_v{int(val)}"
            df.createOrReplaceTempView(view)
            return view

        return self._TT_RE.sub(sub, query)

    @staticmethod
    def _split_assignments(s: str) -> list[str]:
        """Split a SET clause on top-level commas (function-call commas
        inside parens don't separate assignments)."""
        parts: list[str] = []
        depth = 0
        cur: list[str] = []
        for ch in s:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        return parts

    _META_RE = _re.compile(r'(?:"(\w+)\$(\w+)"|(\w+)\$(\w+))')

    def _merge_on_cols(
        self, t_alias: str, s_alias: str, cond: str
    ) -> list[str] | None:
        """Parse a MERGE ON condition of ANDed same-name equi clauses
        (``t.k = s.k AND ...``) into the key column list; None for
        anything else (the caller falls through to Spark's error)."""
        import re

        on_cols: list[str] = []
        for clause in re.split(r"\s+AND\s+", cond, flags=re.IGNORECASE):
            eq = re.match(
                rf"^\s*(?:{t_alias}|{s_alias})\.(\w+)\s*=\s*(?:{t_alias}|{s_alias})\.(\w+)\s*$",
                clause,
            )
            if eq is None or eq.group(1) != eq.group(2):
                return None
            on_cols.append(eq.group(1))
        return on_cols

    def _rewrite_metadata_tables(self, query: str) -> str:
        """Iceberg metadata-table idiom over registered versioned
        tables: ``SELECT * FROM "tbl$files"`` (also bare ``tbl$files``)
        for $files / $snapshots / $history / $partitions — each
        resolves to a temp view served from manifests, no data scan."""

        def sub(m) -> str:
            name = m.group(1) or m.group(3)
            kind = (m.group(2) or m.group(4)).lower()
            vt = self._versioned.get(name)
            if vt is None:
                return m.group(0)
            if kind == "files":
                df = vt.files()
            elif kind in ("snapshots", "history"):
                df = vt.history()
            elif kind == "partitions":
                df = vt.partitions()
            elif kind == "manifests":
                df = vt.manifests()
            else:
                # unknown suffix → NOT a metadata-table reference; leave
                # the token for Spark to resolve (ADVICE r05 #5: raising
                # here turned any stray tbl$xyz token into a hard error)
                return m.group(0)
            view = f"{name}_meta_{kind}"
            df.createOrReplaceTempView(view)
            return view

        # rewrite only OUTSIDE single-quoted string literals — a
        # literal like 'orders_v$files' is DATA, not a table reference
        # (ADVICE r05 #5); '' is the SQL escape for a quote inside one
        parts = self._re.split(r"('(?:[^']|'')*')", query)
        return "".join(
            p if i % 2 else self._META_RE.sub(sub, p) for i, p in enumerate(parts)
        )

    _TVF_CHANGES_RE = _re.compile(
        r"table_changes\(\s*'(\w+)'\s*,\s*(\d+)\s*(?:,\s*(\d+))?\s*\)",
        _re.IGNORECASE,
    )

    def _rewrite_table_changes(self, query: str) -> str:
        """Delta's ``table_changes('tbl', from[, to])`` TVF over
        registered versioned tables: served from the MATERIALIZED feed
        (read_cdf — zero compute) when the table has CDF enabled, else
        computed by read_changes. The quoted table name is part of the
        call syntax, so the rewrite matches the whole call.

        ``from`` is INCLUSIVE, matching Delta's ``startingVersion``
        contract (ADVICE r06 #2): ``table_changes('t', 0)`` includes
        version 0's inserts. The engine-level feeds use an exclusive
        baseline, so the TVF passes ``from - 1`` down (−1 = pre-table
        empty state)."""

        def sub(m) -> str:
            name = m.group(1)
            vt = self._versioned.get(name)
            if vt is None:
                return m.group(0)
            lo = int(m.group(2))
            hi = int(m.group(3)) if m.group(3) else None
            df = (
                vt.read_cdf(lo - 1, hi)
                if vt.cdf_enabled()
                else vt.read_changes(lo - 1, hi)
            )
            view = f"{name}_changes_{lo}_{hi if hi is not None else 'head'}"
            df.createOrReplaceTempView(view)
            return view

        # rewrite only OUTSIDE single-quoted string literals — the text
        # table_changes('t', 0) inside a literal is DATA (same
        # literal-clobbering class _rewrite_metadata_tables fixed;
        # ADVICE r06 #4). The call's own quoted table name straddles
        # the even/odd split, so instead of substituting per-segment we
        # substitute over the WHOLE query and drop any match that
        # STARTS inside a literal span (a genuine call starts at the
        # identifier, always outside one).
        parts = self._re.split(r"('(?:[^']|'')*')", query)
        literal_spans: list[tuple[int, int]] = []
        pos = 0
        for idx, p in enumerate(parts):
            if idx % 2 == 1:
                literal_spans.append((pos, pos + len(p)))
            pos += len(p)

        def guarded(m) -> str:
            if any(a <= m.start() < b for a, b in literal_spans):
                return m.group(0)
            return sub(m)

        return self._TVF_CHANGES_RE.sub(guarded, query)

    def _refresh_versioned(self, name: str) -> None:
        # inside a transaction a touched table's view serves the txn
        # branch head: statements read their own writes
        if self._txn is not None and name in self._txn["tables"]:
            self._versioned[name].read(
                branch=self._txn["name"]
            ).createOrReplaceTempView(name)
        else:
            # branch="main" explicitly: read() with no args serves the
            # NEWEST manifest on any branch — a dangling transaction or
            # side-branch commit must not surface in the view
            self._versioned[name].read(branch="main").createOrReplaceTempView(name)

    def _maybe_versioned_dml(self, query: str) -> DataFrame | None:
        """Route DELETE/UPDATE/INSERT on a registered versioned table to
        merge-on-read commits (Trino's allow_dml-on-Iceberg surface);
        returns a (table, version) receipt DataFrame, or None when the
        statement is not versioned-table DML."""
        m = self._DML_DELETE_RE.match(query)
        if m and m.group(1) in self._versioned:
            name = m.group(1)
            vt = self._versioned[name]
            v = vt.delete_where(m.group(2), branch=self._dml_branch(name), mode="mor")
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DML_UPDATE_RE.match(query)
        if m and m.group(1) in self._versioned:
            name = m.group(1)
            vt = self._versioned[name]
            assignments: dict[str, str] = {}
            for part in self._split_assignments(m.group(2)):
                col, expr = part.split("=", 1)
                assignments[col.strip()] = expr.strip()
            v = vt.update_where(
                assignments, m.group(3), branch=self._dml_branch(name), mode="mor"
            )
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DML_INSERT_RE.match(query)
        if m and m.group(1) in self._versioned:
            name = m.group(1)
            vt = self._versioned[name]
            df = self.spark.sql(m.group(2))
            tbl_cols = vt.read().columns
            if df.columns != tbl_cols and len(df.columns) == len(tbl_cols):
                df = df.toDF(*tbl_cols)  # VALUES yields col1..colN — positional
            v = vt.append(df, branch=self._dml_branch(name))
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DDL_RENAME_RE.match(query)
        if m and m.group(1) in self._versioned:
            # Iceberg ALTER TABLE ... RENAME COLUMN: metadata-only commit
            # (field-id-style tracking — no data rewrite, history keeps
            # its own names)
            name = m.group(1)
            v = self._versioned[name].rename_column(m.group(2), m.group(3))
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DDL_ADD_COL_RE.match(query)
        if m and m.group(1) in self._versioned:
            # Iceberg ALTER TABLE ... ADD COLUMN: metadata-only commit;
            # old rows read the DEFAULT (NULL when omitted). The
            # default literal is evaluated through Spark SQL so quoted
            # strings / numerics / booleans parse the standard way.
            name, col, dtype, default_sql = m.group(1), m.group(2), m.group(3), m.group(4)
            default = None
            if default_sql is not None:
                default_row = self.spark.sql(
                    f"SELECT CAST({default_sql} AS {dtype}) AS v"
                ).collect()[0]
                default = default_row.v
            v = self._versioned[name].add_column(col, dtype, default=default)
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DDL_DROP_COL_RE.match(query)
        if m and m.group(1) in self._versioned:
            name = m.group(1)
            v = self._versioned[name].drop_column(m.group(2))
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DDL_WIDEN_COL_RE.match(query)
        if m and m.group(1) in self._versioned:
            # Iceberg ALTER COLUMN ... TYPE: safe type promotion only
            name = m.group(1)
            v = self._versioned[name].widen_column(m.group(2), m.group(3))
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DML_MERGE_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError(
                    "MERGE INTO is not supported inside a transaction; "
                    "use DELETE/UPDATE/INSERT statements"
                )
            # MERGE INTO t USING s ON t.k = s.k [AND ...] WHEN MATCHED
            # THEN UPDATE SET * [WHEN NOT MATCHED THEN INSERT *] — the
            # UPDATE SET * / INSERT * (upsert-by-key) subset, which is
            # what Iceberg streaming pipelines issue; arbitrary SET
            # expressions go through the UPDATE statement instead
            name, t_alias, src_name, s_alias = m.group(1, 2, 3, 4)
            on_cols = self._merge_on_cols(
                t_alias or name, s_alias or src_name, m.group(5)
            )
            if on_cols is None:
                return None  # non-equi merge: let Spark report it
            vt = self._versioned[name]
            src = self.spark.table(src_name)
            v = vt.merge_into(
                src, on=on_cols, insert_when_not_matched=bool(m.group(6))
            )
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DML_MERGE_DEL_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError(
                    "MERGE INTO is not supported inside a transaction; "
                    "use DELETE/UPDATE/INSERT statements"
                )
            # WHEN MATCHED THEN DELETE: the source's keys retract —
            # one O(|source keys|) equality-delete commit, never a
            # table rewrite (keys absent from the table are no-ops,
            # exactly MERGE's matched-only semantics)
            name, t_alias, src_name, s_alias = m.group(1, 2, 3, 4)
            on_cols = self._merge_on_cols(
                t_alias or name, s_alias or src_name, m.group(5)
            )
            if on_cols is None:
                return None
            vt = self._versioned[name]
            v = vt.delete_keys(self.spark.table(src_name), on=on_cols)
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._DML_MERGE_SYNC_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError(
                    "MERGE INTO is not supported inside a transaction; "
                    "use DELETE/UPDATE/INSERT statements"
                )
            # WHEN NOT MATCHED BY SOURCE THEN DELETE: keys the source
            # no longer carries are retracted — an anti-join of the
            # table's keys against the source's (the honest O(table
            # keys) cost of a full-sync), committed as one
            # equality-delete layer
            name, t_alias, src_name, s_alias = m.group(1, 2, 3, 4)
            on_cols = self._merge_on_cols(
                t_alias or name, s_alias or src_name, m.group(5)
            )
            if on_cols is None:
                return None
            vt = self._versioned[name]
            gone = (
                vt.read(branch="main")
                .select(*on_cols)
                .join(
                    self.spark.table(src_name).select(*on_cols),
                    on=on_cols,
                    how="left_anti",
                )
            )
            v = vt.delete_keys(gone, on=on_cols)
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._MAINT_OPTIMIZE_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError("maintenance statements cannot run inside a transaction")
            # OPTIMIZE tbl [ZORDER BY (a, b) | MANIFESTS]: compaction,
            # the multi-dimensional clustering rewrite (Delta's
            # surface), or the metadata-only schema-layer collapse
            # (Iceberg rewrite_manifests analog, r14)
            name = m.group(1)
            vt = self._versioned[name]
            if m.group(2):
                cols = [c.strip() for c in m.group(2).split(",")]
                v = vt.rewrite_zorder(cols)
            elif m.group(3):
                v = vt.compact_manifests()
                if v is None:  # fewer than two schema layers: no-op
                    v = vt.current_version()
            else:
                v = vt.compact()
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        m = self._MAINT_VACUUM_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                # ADVICE r05 #4: VACUUM mid-transaction could GC the
                # very versions the staged branch builds on
                raise RuntimeError("maintenance statements cannot run inside a transaction")
            # VACUUM tbl [RETAIN n VERSIONS]: expire old snapshots +
            # drop orphaned staging dirs (Delta VACUUM / Iceberg
            # expire_snapshots + remove_orphan_files)
            name = m.group(1)
            vt = self._versioned[name]
            keep = int(m.group(2)) if m.group(2) else 10
            expired = vt.expire_versions(keep_last=keep)
            orphans = vt.remove_orphans()
            return self.spark.createDataFrame(
                [(name, len(expired), len(orphans))],
                "table string, expired_versions bigint, removed_orphans bigint",
            )
        m = self._MAINT_REF_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError("ref DDL cannot run inside a transaction")
            name, action, kind, ref = m.group(1, 2, 3, 4)
            vt = self._versioned[name]
            kind_l = kind.lower()
            if action.upper() == "CREATE":
                at = int(m.group(5)) if m.group(5) else None
                if kind_l == "branch":
                    v = vt.create_branch(ref, at_version=at) if at is not None else vt.create_branch(ref)
                else:
                    v = vt.create_tag(ref, at_version=at) if at is not None else vt.create_tag(ref)
                return self.spark.createDataFrame(
                    [(name, kind_l, ref, v)],
                    "table string, ref_type string, ref_name string, version bigint",
                )
            vt.delete_ref(kind_l, ref)
            return self.spark.createDataFrame(
                [(name, kind_l, ref)], "table string, ref_type string, ref_name string"
            )
        m = self._MAINT_MERGE_BRANCH_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError("ref DDL cannot run inside a transaction")
            name, ref = m.group(1, 2)
            keys = [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
            vt = self._versioned[name]
            v = vt.merge_branch(ref, keys=keys)
            self._refresh_versioned(name)
            return self.spark.createDataFrame(
                [(name, ref, v)], "table string, ref_name string, version bigint"
            )
        m = self._MAINT_HISTORY_RE.match(query)
        if m and m.group(1) in self._versioned:
            return self._versioned[m.group(1)].history()
        m = self._MAINT_DETAIL_RE.match(query)
        if m and m.group(1) in self._versioned:
            # Delta DESCRIBE DETAIL: table facts from manifests only
            return self._versioned[m.group(1)].detail()
        m = self._MAINT_STATS_RE.match(query)
        if m and m.group(1) in self._versioned:
            # Trino SHOW STATS FOR: manifest footer stats, no data scan
            return self._versioned[m.group(1)].column_stats()
        m = self._MAINT_EXPORT_RE.match(query)
        if m and m.group(1) in self._versioned:
            # EXPORT TABLE t [VERSION AS OF n] TO 'dir': read-only —
            # safe inside a transaction (exports the published main
            # state, like any other read of an untouched table)
            name = m.group(1)
            version = int(m.group(2)) if m.group(2) else None
            info = self._versioned[name].export_snapshot(
                m.group(3), version=version
            )
            return self.spark.createDataFrame(
                [(name, info["version"], info["dest"])],
                "table string, version bigint, dest string",
            )
        m = self._MAINT_ADD_FILES_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                raise RuntimeError(
                    "maintenance statements cannot run inside a transaction"
                )
            name = m.group(1)
            v = self._versioned[name].add_files(m.group(2))
            self._refresh_versioned(name)
            return self.spark.createDataFrame(
                [(name, v)], "table string, version bigint"
            )
        m = self._MAINT_RESTORE_RE.match(query)
        if m and m.group(1) in self._versioned:
            if self._txn is not None:
                # ADVICE r05 #4: RESTORE commits straight to main — it
                # would bypass the staged branch and phase-1 validation,
                # publishing intermediate state mid-transaction
                raise RuntimeError("maintenance statements cannot run inside a transaction")
            # Delta RESTORE: forward-history rollback — a new snapshot
            # sharing the old version's files, bad commits kept for audit
            name = m.group(1)
            v = self._versioned[name].restore(int(m.group(2)))
            self._refresh_versioned(name)
            return self.spark.createDataFrame([(name, v)], "table string, version bigint")
        return None

    def sql(self, query: str) -> DataFrame:
        """Serve a SQL statement, recording it in the query history
        (the reference's system.runtime.queries surface). Supports
        Trino's prepared-statement protocol (the wire surface JDBC/BI
        clients drive): ``PREPARE name FROM <stmt>`` stores the
        statement, ``EXECUTE name [USING lit, ...]`` binds positional
        ``?`` parameters through Spark's parameterized SQL (literals
        never string-spliced — injection-safe binding), ``DEALLOCATE
        PREPARE name`` drops it."""
        import time

        t0 = time.perf_counter()
        prepared = self._maybe_prepared_statement(query)
        if prepared is not None:
            self.query_log.record(query, time.perf_counter() - t0, None)
            return prepared
        if self._versioned:
            try:
                dml = self._maybe_versioned_dml(query)
            except Exception as e:  # noqa: BLE001 - recorded then re-raised
                self.query_log.record(query, time.perf_counter() - t0, str(e)[:500])
                raise
            if dml is not None:
                self.query_log.record(query, time.perf_counter() - t0, None)
                return dml
        if self._versioned and " FOR " in query.upper():
            query = self._rewrite_time_travel(query)
        if self._versioned and "$" in query:
            query = self._rewrite_metadata_tables(query)
        if self._versioned and "table_changes" in query.lower():
            query = self._rewrite_table_changes(query)
        if "match_recognize" in query.lower():
            # SQL:2016 row patterns (VERDICT r10 #2): Trino's surface is
            # SQL, so the FROM … MATCH_RECOGNIZE (…) fragment compiles
            # through operators/pattern.py and splices back as a temp
            # view; the rest of the statement stays Catalyst SQL
            from walden_spark.plans.matchrec import rewrite_match_recognize

            try:
                query = rewrite_match_recognize(self.spark, query)
            except Exception as e:  # noqa: BLE001 - recorded then re-raised
                self.query_log.record(query, time.perf_counter() - t0, str(e)[:500])
                raise
        try:
            out = self.spark.sql(query)
        except Exception as e:  # noqa: BLE001 - recorded then re-raised
            self.query_log.record(query, time.perf_counter() - t0, str(e)[:500])
            raise
        self.query_log.record(query, time.perf_counter() - t0, None)
        return out

    # Trino prepared-statement protocol (PREPARE / EXECUTE / DEALLOCATE
    # PREPARE — reference: Trino's client wire protocol, which Superset/
    # JDBC drive for every parameterized dashboard query).
    _PREPARE_RE = _re_mod.compile(
        r"^\s*PREPARE\s+([A-Za-z_][A-Za-z0-9_]*)\s+FROM\s+(.+)$",
        _re_mod.IGNORECASE | _re_mod.DOTALL,
    )
    _EXECUTE_RE = _re_mod.compile(
        r"^\s*EXECUTE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:USING\s+(.+))?$",
        _re_mod.IGNORECASE | _re_mod.DOTALL,
    )
    _DEALLOC_RE = _re_mod.compile(
        r"^\s*DEALLOCATE\s+PREPARE\s+([A-Za-z_][A-Za-z0-9_]*)\s*$",
        _re_mod.IGNORECASE,
    )

    @staticmethod
    def _parse_using_literals(text: str) -> list:
        """Comma-split USING literals (quote-aware) into Python values
        for Spark's parameterized binding: numbers, 'strings' (with ''
        escapes), TRUE/FALSE, NULL."""
        parts, depth, buf, i, in_str = [], 0, [], 0, False
        while i < len(text):
            ch = text[i]
            if in_str:
                buf.append(ch)
                if ch == "'":
                    if i + 1 < len(text) and text[i + 1] == "'":
                        buf.append("'")
                        i += 1
                    else:
                        in_str = False
            elif ch == "'":
                in_str = True
                buf.append(ch)
            elif ch == "(":
                depth += 1
                buf.append(ch)
            elif ch == ")":
                depth -= 1
                buf.append(ch)
            elif ch == "," and depth == 0:
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
            i += 1
        if buf:
            parts.append("".join(buf))
        out = []
        for raw in (p.strip() for p in parts):
            up = raw.upper()
            if up == "NULL":
                out.append(None)
            elif up in ("TRUE", "FALSE"):
                out.append(up == "TRUE")
            elif raw.startswith("'") and raw.endswith("'"):
                out.append(raw[1:-1].replace("''", "'"))
            else:
                try:
                    out.append(int(raw))
                except ValueError:
                    out.append(float(raw))
        return out

    def _maybe_prepared_statement(self, query: str) -> DataFrame | None:
        m = self._PREPARE_RE.match(query)
        if m:
            name, stmt = m.group(1).lower(), m.group(2).strip().rstrip(";")
            self._prepared = getattr(self, "_prepared", {})
            self._prepared[name] = stmt
            return self.spark.createDataFrame([("PREPARE",)], "result string")
        m = self._DEALLOC_RE.match(query)
        if m:
            name = m.group(1).lower()
            prepared = getattr(self, "_prepared", {})
            if name not in prepared:
                raise ValueError(f"prepared statement {name!r} does not exist")
            del prepared[name]
            return self.spark.createDataFrame([("DEALLOCATE",)], "result string")
        m = self._EXECUTE_RE.match(query.strip().rstrip(";"))
        if m and m.group(1).upper() != "IMMEDIATE":  # Spark's own EXECUTE IMMEDIATE passes through
            name = m.group(1).lower()
            prepared = getattr(self, "_prepared", {})
            if name not in prepared:
                raise ValueError(f"prepared statement {name!r} does not exist")
            args = self._parse_using_literals(m.group(2)) if m.group(2) else []
            # positional ? binding via Spark parameterized SQL — the
            # values travel as literals in the plan, never spliced text
            return self.spark.sql(prepared[name], args=args or None)
        return None

    def system_queries(self) -> DataFrame:
        """Query history as a DataFrame (register as a temp view for BI)."""
        from walden_spark.plans.serving import system_queries

        return system_queries(self.spark, self.query_log)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def read_parquet(self, path: str) -> DataFrame:
        return self.spark.read.parquet(path)

    def explain_cost(self, query: str) -> str:
        """Pre-execution cost estimate (reference: Superset
        cost_estimate_enabled, tf/superset/superset.tf:61)."""
        return self.spark.sql(query)._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("cost")
        )

    def stop(self):
        self.spark.stop()
