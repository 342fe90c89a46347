"""Session + catalog layer.

The reference binds a session to the ``chinook`` MySQL database
(``SQL_file.sql:1``) and scans 7 base tables plus one named view.  Here
the equivalent is a SparkSession whose catalog is populated with temp
views over the driver-generated Parquet tables (TESTDATA.md), so every
query can run either through the DataFrame API or ``spark.sql``.

Scale notes (100 TB design point):
  * AQE is enabled — runtime coalescing of shuffle partitions, skew-join
    splitting, and dynamic broadcast conversion are the main levers that
    keep the same logical plans healthy at 1000 executors.
  * ``spark.sql.shuffle.partitions`` defaults low for local testing; on
    a real cluster it should be ~2-3x total cores (AQE coalesces down).
  * Facts (``orders``/``lineitem``/``events``) would be date-partitioned
    and bucketed by join key at scale; the loaders read plain Parquet
    directories, which is layout-agnostic — partition pruning kicks in
    automatically when the underlying layout is partitioned.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

#: Every table the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "chinook-spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Config is chosen for local[N] testing but mirrors what a cluster
    deployment would set: AQE on, Arrow on for any Pandas-UDF path,
    UTC session timezone for deterministic date math.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE partition coalescing knobs, env-parameterised and MEASURED
        # (r12, guide §2.2 / OPTIMIZATION_r12.md): parallelismFirst
        # stays at Spark's default TRUE.  The byte-respecting variant
        # (false + 64 MB advisory) was swept against it over 16
        # representative queries at sf0.1: it wins nothing the default
        # doesn't already coalesce (tiny shuffles hit the 1 MB floor
        # and collapse either way) and costs 1.5-2.5x on CPU-dense,
        # byte-light reduce stages (s04's rid-window self-join, q06's
        # two-stage agg) by squeezing them to 1 task.  On a cluster
        # whose shuffles are TB-sized the two settings converge
        # (bytes/parallelism >> advisory), so the default is also the
        # scale-correct choice; deployments with many small concurrent
        # queries can flip it via env.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_ADVISORY_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark's reader has no
        # nanos timestamp type — read as long and convert on load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs for sessions not built by get_spark
    (e.g. the driver's own session): nanos-timestamp parquet support
    and a UTC session timezone (collected timestamps must not shift
    against the timezone-naive DuckDB oracle)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down (e.g. Spark Connect policy) — proceed


#: (app id, table path) -> (file-stat signature, DataFrame).  Reader
#: memo (r12): every query build calls ``spark.read.parquet`` per table
#: it touches, and each call re-lists the path and re-reads the footer
#: through py4j (~15-40 ms) — pure per-query fixed cost that the bench
#: pays on EVERY rep of EVERY query.  The DataFrame is a lazy plan, not
#: data, so reusing it is catalog-style plan reuse, not result caching:
#: every action still scans the parquet files.  Staleness guard: the
#: signature (size + mtime_ns of the file, or of every entry of a
#: directory table) is re-checked on every lookup, so a rewritten
#: table is a miss and reloads — the failure mode of identity-keyed
#: caches that bit r11 cannot occur.  LRU-capped so long sessions
#: touching many generated corpora don't accumulate dead plans.
_READ_MEMO: OrderedDict = OrderedDict()
_READ_MEMO_MAX = 256
_READ_MEMO_LOCK = __import__("threading").Lock()


def _path_sig(path: str) -> tuple | None:
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        # Recurse (r12 advice): a partitioned layout rewrites part
        # files one level down without touching the parent listing's
        # mtime, so a top-level-only signature could serve a stale
        # file index.  os.walk covers every data file at any depth.
        entries = []
        for dirpath, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(dirpath, f)
                s2 = os.stat(p)
                entries.append(
                    (os.path.relpath(p, path), s2.st_size, s2.st_mtime_ns)
                )
        entries.sort()
        return (st.st_mtime_ns, st.st_size, tuple(entries))
    except OSError:
        return None  # unreadable/odd layout -> never memoize


def _app_id(spark: SparkSession) -> str:
    sc = spark.sparkContext
    app = getattr(sc, "_graft_app_id", None)
    if app is None:
        app = sc.applicationId
        sc._graft_app_id = app
    return app


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import weakref

    path = f"{sf_dir}/{name}.parquet"
    sig = _path_sig(path)
    # Key includes the SESSION object's id (r12 advice): sessions built
    # via newSession() share one applicationId but must not share
    # memoized DataFrames bound to another session.  id() reuse after
    # GC cannot serve a stale entry because the record also holds a
    # weakref to the owning session, verified `is spark` on lookup.
    key = (_app_id(spark), id(spark), path)
    with _READ_MEMO_LOCK:
        rec = _READ_MEMO.get(key)
        if (
            rec is not None
            and sig is not None
            and rec[0] == sig
            and rec[2]() is spark
        ):
            _READ_MEMO.move_to_end(key)
            return rec[1]
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_event_ts(df)
    if sig is not None:
        with _READ_MEMO_LOCK:
            _READ_MEMO[key] = (sig, df, weakref.ref(spark))
            while len(_READ_MEMO) > _READ_MEMO_MAX:
                _READ_MEMO.popitem(last=False)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Map events.ts to a timestamp regardless of the generator's
    physical type: older datasets store nanos-since-epoch longs
    (surfaced via the nanosAsLong conf), newer ones a native
    timestamp[us] that Spark reads as TIMESTAMP_NTZ.  Both normalize
    to TimestampType: the long path divides to micros losslessly (the
    generator's values are microsecond-grained); the NTZ path is a
    wall-clock-preserving cast under the UTC session timezone.
    TimestampType (not NTZ) is required for streaming watermarks and
    matches what timestamp_micros produced for the round-1 data, so
    every downstream plan and oracle is type-stable across generator
    versions."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class _Tables(dict):
    """Lazy table map: reads a Parquet footer only when a query actually
    touches that table (keeps per-query planning minimal)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        df = _load_one(self._spark, self._sf_dir, name)
        self[name] = df
        return df


#: Mounted non-parquet table sets keyed by a pseudo sf_dir handle —
#: how the Chinook adapter (sources.chinook_adapter) plugs the
#: reference's own schema into every registered query.
TABLE_OVERRIDES: dict[str, dict[str, DataFrame]] = {}

#: handle -> (mounted table dict, monotonic seq).  Holding the dict
#: STRONGLY makes the `is` check in :func:`table_set_seq` sound: a
#: re-mounted dict can never reuse the old one's memory while the
#: record still references it (r11 review — the previous scheme keyed
#: caches on bare id(tables), which CPython can hand to a NEW dict
#: after the old one is garbage-collected, silently serving a stale
#: cached view for the re-mounted handle).
_MOUNT_RECORDS: dict[str, tuple[dict, int]] = {}
_MOUNT_COUNTER = __import__("itertools").count(1)


def table_set_seq(handle: str) -> int | None:
    """Stable identity of the table set mounted under ``handle`` —
    changes iff the mounted dict OBJECT changes (raw re-assignment to
    TABLE_OVERRIDES included), None for plain parquet dirs (the path
    is the identity there).  Plan/scalar caches key on this."""
    tables = TABLE_OVERRIDES.get(handle)
    if tables is None:
        # Unmounted handle: drop its record so the strongly-held table
        # dict (DataFrames and all) can be collected — long sessions
        # that mount/unmount many distinct handles must not accumulate
        # dead table sets (r11 advice).
        _MOUNT_RECORDS.pop(handle, None)
        return None
    rec = _MOUNT_RECORDS.get(handle)
    if rec is None or rec[0] is not tables:
        rec = (tables, next(_MOUNT_COUNTER))
        _MOUNT_RECORDS[handle] = rec
    return rec[1]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Lazy map of every driver table, keyed by name.

    Reads are lazy in both senses: the footer is read on first access,
    and Catalyst prunes columns / pushes filters into the Parquet scan
    per consuming query.  A mounted override handle (TABLE_OVERRIDES)
    returns that table set instead.
    """
    ensure_session_confs(spark)
    if sf_dir in TABLE_OVERRIDES:
        return TABLE_OVERRIDES[sf_dir]
    return _Tables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (the ``use chinook`` analog).

    Also registers the engine's named derived view
    ``nation0_type_sales`` — the analog of the reference's
    ``usa_genre_sales`` view (SQL_file.sql:148-165) — so SQL-entry
    queries can consume it like a catalog object.
    """
    dfs = load_tables(spark, sf_dir)
    # Iterate TABLES (not dfs.items()) — the lazy map materializes a
    # table only on access, so .items() would be empty here.  A mounted
    # override set may be PARTIAL (the Chinook adapter maps 7 of the 10
    # driver tables): register what it has rather than KeyError on the
    # absent ones — queries over missing tables fail at their own call,
    # with a clear missing-view message, not at mount time (r10 review).
    for name in TABLES:
        if sf_dir in TABLE_OVERRIDES and name not in TABLE_OVERRIDES[sf_dir]:
            continue
        dfs[name].createOrReplaceTempView(name)
    # Deferred import: plans depends on functions only.
    from ..plans.views import nation0_type_sales

    view_base = {"customer", "orders", "lineitem", "part", "nation"}
    if sf_dir not in TABLE_OVERRIDES or view_base <= set(TABLE_OVERRIDES[sf_dir]):
        nation0_type_sales(spark, sf_dir).createOrReplaceTempView(
            "nation0_type_sales"
        )
    return dfs
