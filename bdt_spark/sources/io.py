"""File registration and table-name inference.

Reimplements the reference's native pieces (reference citations for parity):
- format dispatch by extension      -> utils.rs:12-23 (FileFormat enum)
- sanitize_table_name               -> utils.rs:41-51
- register_table                    -> utils.rs:53-87
- directory registration (--tables) -> main.rs:154-166

Differences (documented improvements, not regressions):
- The reference leaves Arrow `unimplemented!()` (utils.rs:59-61); we read
  .arrow/.feather via pyarrow on the driver and parallelize via
  createDataFrame (small files only — documented).
- ORC added (native Spark reader; not in the reference).
- Avro reads natively via the spark-avro jar when present; without it
  (this environment) a self-contained pure-Python container-file decoder
  (sources/avro.py, written from the public Avro spec) runs distributed
  over `binaryFile` + Arrow-batched mapInPandas — per-file parallelism.

Scale notes: `spark.read.parquet(dir)` accepts a directory of files natively
(the DataFusion listing-table equivalent). Schema inference for CSV/JSON scans
the file once — identical cost shape to the reference's eager inference at
registration (utils.rs:66-72).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

# Extension -> Spark reader format. Mirrors utils.rs:12-23 plus extensions.
EXTENSION_FORMATS = {
    "parquet": "parquet",
    "parq": "parquet",  # utils.rs:17
    "csv": "csv",
    "tsv": "csv",
    "json": "json",  # newline-delimited, utils.rs:70-72
    "ndjson": "json",
    "avro": "avro",
    "orc": "orc",
    "arrow": "arrow",  # reference: unimplemented!(); here: pyarrow bridge
    "feather": "arrow",
}

FIXTURE_TABLES = (
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


class UnsupportedFormatError(ValueError):
    """Mirrors the reference's error for unknown extensions (utils.rs:18-21)."""


def file_format(path: str) -> str:
    """Extension dispatch (utils.rs:12-23). Raises on unknown extension."""
    ext = Path(path).suffix.lstrip(".").lower()
    if ext not in EXTENSION_FORMATS:
        raise UnsupportedFormatError(f"unsupported file extension in path: {path!r}")
    return EXTENSION_FORMATS[ext]


def sanitize_table_name(name: str) -> str:
    """Replace every non [A-Za-z0-9_] char with '_' (utils.rs:41-51)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def table_name_from_path(path: str) -> str:
    """File stem -> sanitized table name (main.rs:167-176 + utils.rs:41)."""
    return sanitize_table_name(Path(path).stem)


def _arrow_table_from_bytes(content: bytes):
    """Decode one Arrow IPC payload: random-access (feather v2) file
    format first, stream format as fallback — same order the readers
    probe magic bytes."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    buf = pa.BufferReader(content)
    try:
        return ipc.open_file(buf).read_all()
    except pa.ArrowInvalid:
        buf.seek(0)
        return ipc.open_stream(buf).read_all()


def _read_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC/feather read, distributed: one task per file via
    binaryFile + mapInPandas (schema resolved from the first file's
    footer on the driver — a lazy pyarrow open, not a full read; other
    files are schema-checked in their tasks). Arrow IPC files at scale
    come as many per-shard files, so per-file is the natural split.

    The reference declares the Arrow variant but panics on it
    (utils.rs:59-61) — this is a strict improvement.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.feather as feather
    import pyarrow.ipc as ipc

    first = path
    if os.path.isdir(path):
        cand = sorted(
            _glob.glob(os.path.join(path, "*.arrow"))
            + _glob.glob(os.path.join(path, "*.feather"))
        )
        if not cand:
            raise ValueError(f"no .arrow/.feather files under {path!r}")
        first = cand[0]
    try:
        with pa.memory_map(first, "rb") as f:
            arrow_schema = ipc.open_file(f).schema
    except pa.ArrowInvalid:
        try:
            # IPC *stream* format: the schema is the stream's first
            # message, so this reads only the header, no data
            with pa.memory_map(first, "rb") as f:
                arrow_schema = ipc.open_stream(f).schema
        except pa.ArrowInvalid:
            arrow_schema = feather.read_table(first).schema  # feather v1
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(arrow_schema)
    cols = [f.name for f in spark_schema.fields]

    def _decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                tbl = _arrow_table_from_bytes(bytes(content))
                if tbl.schema.names != list(cols):
                    raise ValueError(
                        f"arrow schema mismatch across files under {path!r}"
                    )
                yield tbl.to_pandas()

    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{arrow,feather}" if os.path.isdir(path) else "*")
        .load(path)
    )
    return bin_df.select("content").mapInPandas(_decode, schema=spark_schema)


AVRO_SPLIT_BYTES = 32 << 20  # fallback-path input-split size


def _read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read .avro: native spark-avro jar if installed, else the built-in
    pure-Python container decoder distributed over mapInPandas.

    The python fallback parallelizes per BLOCK RANGE, not per file: the
    driver reads only each file's header, byte-slices every file into
    ~AVRO_SPLIT_BYTES ranges, and each task scans to the first 16-byte sync
    marker in its range and decodes the blocks that start there (the
    standard Avro input-split contract — adjacent ranges never skip or
    double-read a block). One giant container file therefore fans out to
    many tasks instead of one straggler. Executors read the file with
    plain POSIX IO, so the split path requires locally-reachable storage
    (local/NFS/fuse mounts); for remote URIs we fall back to whole-file
    decode via binaryFile, which routes bytes through the Hadoop
    filesystem (and at real scale the spark-avro jar's native source is
    the right tool anyway).

    Every file's embedded writer schema is checked against the first
    file's; a mismatch raises AvroError instead of silently nulling
    missing fields / dropping extra ones (`r.get` would otherwise reshape
    evolved files without a sound).
    """
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.format("avro").load(path)
        df.schema  # forces source resolution; raises without the jar
        return df
    except AnalysisException:
        pass  # jar absent (FAILED_TO_FIND_DATA_SOURCE) -> spec decoder

    import glob as _glob

    from bdt_spark.sources import avro as A

    local = "://" not in path or path.startswith("file:")
    fs_path = path
    if path.startswith("file:"):
        from urllib.parse import urlparse

        fs_path = urlparse(path).path or path

    if local and os.path.isdir(fs_path):
        files = sorted(_glob.glob(os.path.join(fs_path, "*.avro")))
        if not files:
            raise A.AvroError(f"no .avro files under {path!r}")
    elif local:
        files = [fs_path]
    else:
        files = []

    if not local:
        # remote URI: whole-file decode via the Hadoop-IO binaryFile source
        bin_df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.avro")
            .load(path)
        )
        first_content = bytes(bin_df.select("content").first()["content"])
        header_schema, _, _, _ = A.read_header(first_content)
        spark_schema = A.avro_schema_to_spark(header_schema)
        cols = [f.name for f in spark_schema.fields]

        def _decode_whole(batches):
            import pandas as pd

            for pdf in batches:
                for content in pdf["content"]:
                    schema_j, rows = A.decode_file(bytes(content))
                    if schema_j != header_schema:
                        raise A.AvroError(
                            "avro schema mismatch across files under "
                            f"{path!r}; convert to one schema"
                        )
                    yield pd.DataFrame(
                        {c: [r.get(c) for r in rows] for c in cols},
                        columns=cols,
                    )

        return bin_df.select("content").mapInPandas(
            _decode_whole, schema=spark_schema
        )

    with open(files[0], "rb") as f:
        header_schema, _, _, _ = A.read_header_from(f)
    spark_schema = A.avro_schema_to_spark(header_schema)
    cols = [f.name for f in spark_schema.fields]

    splits = []
    for fp in files:
        size = os.path.getsize(fp)
        for off in range(0, max(size, 1), AVRO_SPLIT_BYTES):
            splits.append((fp, off, min(off + AVRO_SPLIT_BYTES, size)))

    def _decode_ranges(batches):
        import pandas as pd

        for pdf in batches:
            for fp, start, stop in zip(pdf["path"], pdf["start"], pdf["stop"]):
                _, rows = A.decode_range(
                    fp, int(start), int(stop), expected_schema=header_schema
                )
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in cols},
                    columns=cols,
                )

    from bdt_spark.operators.localrel import local_relation

    # LocalRelation (no pickled-RDD scan): the decode itself is Python
    # (mapInPandas), but the split list should not cost an extra
    # Python-worker round before the repartition (guide §4.1).
    splits_df = local_relation(
        spark, splits, "path string, start long, stop long"
    ).repartition(len(splits))
    return splits_df.mapInPandas(_decode_ranges, schema=spark_schema)


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (driver-side footer peek).

    Spark 4 cannot read nanosecond timestamps natively; with
    `spark.sql.legacy.parquet.nanosAsLong` they surface as LongType and we
    convert to micros-truncated timestamps — the same truncation DuckDB and
    the SURVEY §1.2 mapping prescribe.
    """
    import pyarrow.dataset as ds
    import pyarrow as pa

    try:
        schema = ds.dataset(path, format="parquet").schema
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    ]


def read_file(
    spark: SparkSession,
    path: str,
    *,
    header: bool = True,
    infer_schema: bool = True,
    fmt: str | None = None,
) -> DataFrame:
    """Read one file/directory into a DataFrame by extension dispatch.

    CSV defaults to header=True + inferSchema, matching the reference's
    default CsvReadOptions (utils.rs:66-68); `header=False` mirrors
    `--no-header-row` (main.rs:95-97).
    """
    fmt = fmt or file_format(path)
    if fmt == "arrow":
        return _read_arrow(spark, path)
    if fmt == "avro":
        return _read_avro(spark, path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", str(header).lower()).option(
            "inferSchema", str(infer_schema).lower()
        )
        if path.lower().endswith(".tsv"):
            reader = reader.option("sep", "\t")
    if fmt == "parquet":
        nano_cols = _nano_timestamp_columns(path)
        if nano_cols:
            # Runtime-set so sessions not built by bdt_spark.session (e.g.
            # the driver's own) still read nanos parquet. Spark 4 errors on
            # TIMESTAMP(NANOS) without this.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = reader.format(fmt).load(path)
        for col in nano_cols:
            df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(reader.format(fmt).load(path))


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to session-zone TIMESTAMP.

    Parquet written without isAdjustedToUTC surfaces as TIMESTAMP_NTZ,
    which strict-LTZ functions (unix_micros, to_utc_timestamp, ...)
    reject. The session is pinned to UTC (SURVEY §1.2: naive timestamps
    mean UTC wall time), so the cast preserves the wall-clock value while
    restoring the TIMESTAMP type every query expects."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for col in ntz:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_table(
    spark: SparkSession,
    name: str,
    path: str,
    *,
    header: bool = True,
) -> DataFrame:
    """Register a file as a temp view and return its DataFrame (utils.rs:53-87)."""
    df = read_file(spark, path, header=header)
    df.createOrReplaceTempView(name)
    return df


def register_dir(
    spark: SparkSession,
    directory: str,
    *,
    skip_unsupported: bool = False,
    announce=None,
) -> dict[str, DataFrame]:
    """Register every file in a directory (main.rs:154-166).

    `announce(name, path)`, if given, is called per registered table —
    the CLI uses it for the reference's "Registering table '<name>' for
    <path>" lines (main.rs:163,174) without the library printing.

    Like the reference, an unsupported extension is an ERROR, not a silent
    skip — main.rs registers every entry and fails on unknown extensions.
    Subdirectories and hidden files are ignored (they are not files the
    reference's loop would register). Pass `skip_unsupported=True` for the
    lenient mode.
    """
    out: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(directory)):
        full = os.path.join(directory, entry)
        if entry.startswith(".") or entry.startswith("_"):
            continue  # hidden/metadata entries (e.g. _SUCCESS markers)
        try:
            file_format(full)
        except UnsupportedFormatError:
            # a directory without a data extension (e.g. a nested output
            # dir) is not a registerable entry either way; only FILES with
            # unknown extensions are the reference's error case
            if skip_unsupported or os.path.isdir(full):
                continue
            raise UnsupportedFormatError(
                f"unsupported file in --tables directory: {full!r} "
                "(pass only recognized extensions: "
                f"{', '.join(sorted(EXTENSION_FORMATS))})"
            ) from None
        name = table_name_from_path(full)
        if announce is not None:
            announce(name, full)
        out[name] = register_table(spark, name, full)
    return out


# Memo of which sf_dir is currently registered per live session, so a batch
# of queries over the same fixture dir pays registration once.
_FIXTURES_LOADED: dict[int, str] = {}


# Tables whose CPU-HEAVY consumers (char-gram md5, shingling, token
# scoring right above the scan) may opt into a scan fan-out when the
# fixture parquet is under-split: an under-split scan serializes that
# work, and the rows are narrow enough that one extra exchange is noise
# next to it. Measured at sf10, documents fan-out: winnowing 166 s ->
# 46 s, TF-IDF 91 s -> 19 s, NB langid 144 s -> 98 s, prefix-Jaccard
# 20 s -> 12 s. The relational tables are deliberately NOT here — their
# first stage is a cheap partial aggregate where an added corpus shuffle
# costs more than the scan skew (measured: tpch_q1 at sf0.1 went 0.40 s
# -> 0.97 s with lineitem fanned out). `embeddings` is excluded too: its
# queries run operator pipelines with their own persist/bucket/window
# structure, and fanning their input measured NET NEGATIVE
# (dedup_embedding_cosine at sf10: 12.6 s -> 41 s) — the per-vector fold
# is JVM-cheap enough that the extra exchange and the disrupted operator
# partitioning dominate.
#
# r12 relocation (VERDICT r11 item 1): the fan-out used to live at VIEW
# REGISTRATION (every consumer paid it), which taxed 13 cheap single-agg
# sf0.1 queries 1.2-2.6x for nothing. Registration now only RECORDS the
# under-split fact per session; each CPU-heavy query opts in via
# registry.sql_query(fanout=...) / fanout_rewrite(), which injects a
# /*+ REPARTITION(n) */ hinted subquery into the SPARK text only —
# oracle texts never see it, and at production scale (thousands of row
# groups) the recorded condition is false so the rewrite is a no-op.
_FANOUT_CANDIDATE_TABLES = frozenset({"documents"})

# session-key -> {table name: fan-out target partitions} for candidate
# tables whose registered parquet had fewer row groups than cores.
_UNDERSPLIT: dict[int, dict[str, int]] = {}

# session-key -> {table name: on-disk bytes of the registered fixture
# file/dir} — EXACT input statistics recorded at registration time.
_TABLE_BYTES: dict[int, dict[str, int]] = {}


def hadoop_exists(spark: SparkSession, p: str) -> bool:
    """Driver-side existence check through the Hadoop FS abstraction —
    works on any filesystem the session can reach, unlike
    os.path.isdir; used by the incremental state/index guards."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    jp = jvm_path(p)
    return jp.getFileSystem(spark._jsc.hadoopConfiguration()).exists(jp)


def _path_bytes(path: str) -> int:
    """On-disk bytes of a data file or a directory of part files."""
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith((".", "_")):
                    total += os.path.getsize(os.path.join(root, f))
        return total
    return os.path.getsize(path)


def fixture_scan_bytes(spark: SparkSession, table: str) -> int:
    """On-disk bytes of a registered fixture table — the exact number a
    small-vs-large plan gate needs, where Catalyst's derived estimates
    are exactly the thing that cannot be trusted (it sizes an explode's
    output from the scan's column ratio; see text_tfidf_topk_similar's
    sf100 finding). Queries use this to pick between a small-scan plan
    and a heavy-corpus plan: fan-out exchanges and persist+count
    actions cost FIXED overhead but save work PROPORTIONAL to corpus
    CPU, so below a byte threshold the bare inline plan wins (measured:
    text_pmi_cooccurrence 1.25 s bare vs 2.2 s fanned+materialized at
    sf0.1) and above it the heavy plan wins (10 s steady vs 10-37 s
    bimodal at sf10).
    Returns a large sentinel when the table is unknown, so gates fail
    toward the scale-safe materialized path."""
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    return _TABLE_BYTES.get(key, {}).get(table, 1 << 60)


# Compressed scan bytes per shuffle partition for GATED HEAVY ARMS.
# Measured doctrine (SCALE.md r13, encoded r14 per VERDICT r13 #1): the
# sf100 q21 rewrite (6.4 GB lineitem) can transiently die with task-level
# UNABLE_TO_ACQUIRE_MEMORY at 256 shuffle partitions on an 8 GB heap /
# 32 concurrent tasks, and rides through with 0-2 retried tasks at 512.
# 16 MiB/partition reproduces exactly that: 6.4 GB -> 512, and scales the
# same per-task memory envelope to any fact size the gate can see.
_HEAVY_BYTES_PER_SHUFFLE_PARTITION = 16 << 20


def exchange_width_for_bytes(b: int, floor: int = 32) -> int:
    """Partition width for an EXPLICIT exchange hint (`REPARTITION(n)`),
    derived from the exact scan bytes feeding it.

    An explicit-width repartition is exempt from AQE coalescing AND
    splitting, so a literal width is a coded-in bottleneck at 100x
    scale (VERDICT r14 #1: the exchange-reuse hints on the incremental
    dedup signature streams were pinned at 32 — hundreds of GB through
    32 tasks at the design point). Same doctrine as
    ensure_heavy_arm_geometry: one partition per
    _HEAVY_BYTES_PER_SHUFFLE_PARTITION (16 MiB) of scan bytes,
    power-of-two steps, raised from `floor` (the local session
    default), clamped at 4096. The exchanged stream (signatures,
    bucketed projections) is strictly smaller than its input scan, so
    the width errs WIDE — err-wide costs scheduling overhead on small
    data, err-narrow costs a straggler/spill stage at scale. The
    unknown-table sentinel (1<<60) clamps to 4096, failing wide like
    the heavy-arm hook."""
    w = floor
    while w < 4096 and w * _HEAVY_BYTES_PER_SHUFFLE_PARTITION < b:
        w *= 2
    return w


def ensure_heavy_arm_geometry(spark: SparkSession, table: str) -> int:
    """Execution geometry for a size-gated heavy plan arm: derive shuffle
    partitions from the fact table's EXACT scan bytes and raise the
    session's `spark.sql.shuffle.partitions` if it is below that.

    Why this exists: the big-fact gate (_BIG_FACT_MIN_BYTES in
    plans/tpch.py) picks the plan SHAPE from scan bytes, but a correct
    shape at a product-default partition count can still exceed the
    per-task memory envelope (the r13 sf100 finding above). The safe
    partition count is a function of the same scan bytes the gate
    already trusts, so the arm that needs it sets it — doctrine in code,
    not in SCALE.md.

    Only ever RAISES the setting (power-of-two steps, clamped to
    [64, 4096]); AQE partition coalescing (on by default,
    session.py) merges small shuffle reads back down, so a later small
    query in the same session pays scheduling overhead at worst, never a
    plan regression. An unknown table's 1<<60 sentinel clamps to 4096 —
    failing wide, the same direction as the gate itself. Returns the
    partition count in effect after the call."""
    b = fixture_scan_bytes(spark, table)
    needed = 64
    while needed < 4096 and needed * _HEAVY_BYTES_PER_SHUFFLE_PARTITION < b:
        needed *= 2
    current = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if needed > current:
        spark.conf.set("spark.sql.shuffle.partitions", str(needed))
        return needed
    return current


def _parquet_scan_splits(path: str) -> int:
    """Splittable scan units of a parquet table = its ROW-GROUP count,
    summed over part files when the table is a directory.

    Spark carves files into byte-range splits, but a split that contains
    no row-group start reads nothing — so a 10 MB single-row-group file
    yields ONE working scan task no matter how many byte ranges the
    planner emits. Driver-side footer peek, no Spark job. For a
    directory-of-parts layout (the production shape; r13 probe measured
    native parts 0.30-0.86x the fanned single-file plan on the sf10 text
    family) the unit count is the SUM over members, so a many-part dir
    is correctly not under-split and a 2-part dir of single-row-group
    files still is. Footer peeks stop as soon as the core count is
    unreachable-from-below (>=4096 members short-circuits: no cluster
    this code targets schedules more initial scan tasks than that).

    Members are collected with os.walk, so hive-partitioned layouts
    (table/lang=en/part-*.parquet) and nested writer output count their
    real part files. A directory with NO .parquet/.parq members anywhere
    (extension-less parts, unknown layout) returns the assume-wide
    sentinel — the same fail-safe as the exception path — instead of
    max(1, 0)=1, which would record the table under-split and let
    fanout_rewrite inject a corpus-wide REPARTITION on exactly the
    layouts the r13 probe measured as harmed by fan-out (ADVICE r13)."""
    import pyarrow.parquet as pq

    try:
        if os.path.isdir(path):
            members = []
            for root, dirs, files in os.walk(path):
                dirs[:] = sorted(
                    d for d in dirs if not d.startswith(("_", "."))
                )
                members.extend(
                    os.path.join(root, f)
                    for f in sorted(files)
                    if f.endswith((".parquet", ".parq"))
                    and not f.startswith(("_", "."))
                )
                if len(members) >= 4096:
                    break
            if not members:
                return 1 << 30  # unknown layout: assume wide, no shuffle
            if len(members) >= 4096:
                return len(members)
            total = 0
            for m in members:
                total += max(1, pq.read_metadata(m).num_row_groups)
                if total >= 4096:  # bound the footer peeks: already wide
                    break
            return max(1, total)
        return max(1, pq.read_metadata(path).num_row_groups)
    except Exception:
        return 1 << 30  # unknown layout: assume wide, never add a shuffle


def load_fixture_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = FIXTURE_TABLES,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Register the driver's fixture tables (TESTDATA.md) as temp views.

    Fan-out gate (r11, relocated r12): a candidate table
    (_FANOUT_CANDIDATE_TABLES) whose parquet has fewer row groups than
    the cluster has cores is RECORDED as under-split (_UNDERSPLIT); the
    view itself is always the plain scan. CPU-heavy queries opt into the
    fan-out per-query via fanout_rewrite() — see _FANOUT_CANDIDATE_TABLES
    for the measured rationale. The generated fixtures are single files
    with 1-5 row groups (sf0.1: every table is ONE row group), so without
    the opt-in the text queries' dominant stage — scan + the per-row CPU
    fused above it (md5 grams, shingles) — runs on that handful of tasks
    while 32 cores idle. The row-group gate makes the opt-in a structural
    no-op at production scale: a real 100 TB table has thousands of row
    groups, the condition is false, and no corpus-wide shuffle is ever
    added where the scan already fills the cluster."""
    # Runtime conf insurance for sessions not built by bdt_spark.session
    # (e.g. the driver's): UTC makes epoch math match DuckDB's UTC-naive
    # timestamps (SURVEY §7 conformance shims).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    if not force and _FIXTURES_LOADED.get(key) == sf_dir:
        return {t: spark.table(t) for t in tables if spark.catalog.tableExists(t)}
    present = [
        t for t in tables if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    # Registration is driver-side metadata work (footer peek + DataFrame
    # creation + temp-view registration) — ~0.2 s per table serially, all
    # py4j round-trips. The session is thread-safe for reads, so do the
    # 10 tables on a small thread pool.
    from concurrent.futures import ThreadPoolExecutor

    par = spark.sparkContext.defaultParallelism
    undersplit: dict[str, int] = {}
    table_bytes: dict[str, int] = {}

    def _reg(t: str):
        path = os.path.join(sf_dir, f"{t}.parquet")
        df = register_table(spark, t, path)
        table_bytes[t] = _path_bytes(path)
        if t in _FANOUT_CANDIDATE_TABLES and _parquet_scan_splits(path) < par:
            undersplit[t] = par
        return t, df

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(present)))) as ex:
        out = dict(ex.map(_reg, present))
    # Requested fixture tables with no file in THIS sf_dir: drop any
    # stale temp view left by a previous registration — otherwise a
    # query against the new dir silently reads the OLD dir's data for
    # that table (bit the r12 embeddings-only sf100 probe, whose stats
    # read the previous shard's documents view). Views outside the
    # requested set are caller-managed and untouched.
    for t in tables:
        if t not in out and spark.catalog.tableExists(t):
            spark.catalog.dropTempView(t)
    _UNDERSPLIT[key] = undersplit
    _TABLE_BYTES[key] = table_bytes
    _FIXTURES_LOADED[key] = sf_dir
    return out


_FANOUT_FROM_RE = {
    t: re.compile(rf"\bFROM\s+{t}\b(?!\.)", re.IGNORECASE)
    for t in _FANOUT_CANDIDATE_TABLES
}


def fanout_rewrite(
    spark: SparkSession, sql: str, tables: tuple[str, ...]
) -> str:
    """Opt-in scan fan-out for CPU-heavy SPARK query texts.

    For each named table that load_fixture_tables recorded as
    under-split for this session, rewrite `FROM <table>` into
    `FROM (SELECT /*+ REPARTITION(n) */ * FROM <table>)` — the same
    exchange the r11 registration-time gate added for every consumer,
    now paid only by queries whose dominant stage is per-row CPU right
    above the scan. Trailing aliases/WHERE/GROUP BY survive (a
    parenthesized subquery is relation-position compatible), Catalyst
    still pushes filters and column pruning through the repartition,
    and the ORACLE text is never rewritten — DuckDB would lex the hint
    away anyway, but the dialects stay textually honest. When the scan
    is already wide (production layout), the recorded condition is
    false and the text passes through untouched."""
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    recorded = _UNDERSPLIT.get(key, {})
    for t in tables:
        n = recorded.get(t)
        if n:
            sql = _FANOUT_FROM_RE[t].sub(
                f"FROM (SELECT /*+ REPARTITION({n}) */ * FROM {t})", sql
            )
    return sql


def fanned_table(spark: SparkSession, table: str) -> DataFrame:
    """DataFrame-API twin of fanout_rewrite for @query-style callables:
    the registered view, repartitioned up to defaultParallelism iff the
    registration recorded it as under-split."""
    df = spark.table(table)
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    n = _UNDERSPLIT.get(key, {}).get(table)
    return df.repartition(n) if n else df
