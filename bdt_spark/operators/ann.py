"""Persistent IVF (inverted-file) ANN index: build once, probe many.

The declared `similarity_*` queries compute their cluster structure inline
so they can be oracled; a production pipeline builds the index ONCE and
amortizes it over every probe. This operator persists:

    {path}/centroids/    cluster_id, centroid array<double>
    {path}/assignments/  vec_id, embedding, nrm — hive-partitioned by
                         cluster_id (cluster_id=N/ dirs, one file each)

Build = Lloyd's k-means, fully distributed and deterministic:
- init: the k vectors with the lexicographically smallest md5(vec_id) —
  stable across runs/partitionings (no rand()).
- assignment step: corpus x centroids distance via a broadcast of the k
  centroid arrays (k is small; the corpus never shuffles for assignment).
- update step: explode assigned vectors -> (cluster, dim) partial-agg
  mean -> regroup to arrays. Two narrow shuffles per iteration.

Probe = nearest `nprobe` centroids per query (broadcast again), then
exact cosine only against those clusters' rows — the candidate set is
corpus_size * nprobe / k instead of the full corpus.

At 100 TB: assignments are hive-partitioned by cluster_id and the probe
pushes its (<= k) probed cluster ids as a DRIVER-COLLECTED partition
filter — the ids are collected on the driver and baked into the plan as
an `isin` literal before planning (this is static pruning, not Spark's
dynamic partition pruning mechanism), so a probe OPENS only its
clusters' files — proved by executed-scan metrics in tests/test_ann.py;
centroids stay driver-size.

Incremental maintenance (VERDICT r14 #3 — production ingest must not
rebuild the index per batch):
- `update_ivf_index` assigns a NEW batch to the EXISTING centroids with
  a zero-shuffle argmin projection (the k centroid arrays are embedded
  as literals — k is driver-size by construction) and appends it as a
  replay-idempotent increment partition
  `{path}/increments/batch=<id>/cluster_id=N/` (dynamic partition
  overwrite, the dedup-state layout). Per-batch ingest cost is
  map-only over the batch; the corpus is never rescanned.
- `ivf_probe` unions live increments into its pruned candidate set
  (same cluster_id partition filter, one directory level deeper) and
  resolves latest-batch-wins per vec_id over the PRUNED rows only —
  base-only indexes keep their unchanged plan.
- `compact_ivf_index` folds increments back into the cluster-local base
  layout offline (write-new / swap / delete ordering; a crash between
  steps leaves duplicates that the probe's latest-wins already
  resolves, never a missing index).
- `ivf_index_stats` reads per-cluster row counts from parquet FOOTERS
  (driver-side, no Spark job) and flags recluster_recommended when the
  max/mean cluster skew crosses a threshold — assignment to frozen
  centroids degrades as the distribution drifts; the gate says when to
  pay for a full `build_ivf_index` re-train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _dist2(vec_col: str, cen_col: str) -> str:
    # squared L2 as a sequential fold — codegen-friendly, no UDF
    return (
        f"aggregate(zip_with({vec_col}, {cen_col},"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(e: str) -> str:
    """Euclidean norm as a sequential fold — projected ONCE per vector row
    (pre-join), never inline per candidate pair: interpreted higher-order
    folds are the dominant probe cost when evaluated O(pairs) times."""
    return (
        f"SQRT(aggregate(transform({e}, x -> CAST(x AS DOUBLE)"
        " * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def _cos_sim_pre(a: str, b: str, a_nrm: str, b_nrm: str) -> str:
    """Cosine from precomputed norm columns.

    Denominator guard: yield NULL (callers filter it) whenever the norm
    product is 0 or non-finite, instead of NaN/Inf — which would pass an
    isNotNull filter and sort GREATEST in Spark ordering, top-ranking
    garbage pairs. The product test covers every bad case through the
    cheap norm columns alone: a zero norm (no cosine direction), the
    product underflowing to 0.0 for two tiny-but-nonzero vectors
    (dot/0.0 -> NaN/Inf), an Inf norm from huge elements, and NaN norms
    from NaN elements (a dot overflowing to Inf implies an Inf norm, so
    it's caught here without re-evaluating the expensive dot fold)."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    prod = f"({a_nrm} * {b_nrm})"
    return (
        f"IF({prod} = 0.0 OR isnan({prod}) OR {prod} = double('Infinity'),"
        f" CAST(NULL AS DOUBLE), {dot} / {prod})"
    )


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment via broadcast cross join (k is small)."""
    joined = emb.crossJoin(F.broadcast(centroids))
    d = F.expr(_dist2("embedding", "centroid"))
    w = Window.partitionBy("vec_id").orderBy(
        F.round(d, 9).asc(), F.col("cluster_id").asc()
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("vec_id", "cluster_id", "embedding")
    )


def _driver_roundtrip(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Collect a driver-size DataFrame and re-create it as a fresh local
    relation: truncates lineage (bounded plans across Lloyd iterations)
    with zero cache residue. IEEE-754 doubles roundtrip bit-exactly
    through collect/createDataFrame, so both index writes see identical
    centroid values. ONLY for frames that are driver-size by
    construction (k centroid rows).

    Recreated as a JVM LocalRelation (operators/localrel.py): the
    centroid frame is re-scanned by every Lloyd-iteration assignment
    join and every probe, and createDataFrame's pickled-RDD scan pays a
    Python-worker round each time (guide §4.1); doubles render via
    shortest-repr so the bit-exactness guarantee is unchanged."""
    from bdt_spark.operators.localrel import local_relation

    rows = df.collect()
    return local_relation(spark, rows, df.schema)


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train k-means and persist the IVF index at `path`."""
    emb = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    # duplicate ids would be silently collapsed by the per-id argmin in
    # _assign (one of the embeddings vanishes from the index, unfindable
    # by any probe) — reject them at build time instead
    [dup_check] = (
        emb.agg(
            F.count("*").alias("n"),
            F.countDistinct("vec_id").alias("d"),
        ).collect()
    )
    if dup_check.n != dup_check.d:
        raise ValueError(
            f"{id_col!r} must be unique: {dup_check.n} rows but only "
            f"{dup_check.d} distinct ids"
        )
    # deterministic seeds: smallest md5(vec_id), stable on any cluster
    seeds = (
        emb.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h")
        .limit(k)
    )
    centroids = (
        seeds.withColumn(
            "cluster_id", F.row_number().over(Window.orderBy("__h")) - 1
        )
        .select(
            "cluster_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "centroid"
            ),
        )
    )
    for i in range(n_iters):
        assigned = _assign(emb, centroids)
        centroids = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    # 38,12 = 26 integer digits of headroom: 30,12 held
                    # only 18, and a large-magnitude embedding sum
                    # overflows the CAST under ANSI (Spark 4 default)
                    F.sum(F.col("v").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("cluster_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))),"
                    " s -> s.m)"
                ).alias("centroid")
            )
        )
        if (i + 1) % 5 == 0 and i + 1 < n_iters:
            # k rows only, but the lineage doubles per Lloyd iteration:
            # truncate every 5 so long trainings keep bounded plans and a
            # straggler retry re-runs one iteration, not the whole chain
            centroids = _driver_roundtrip(spark, centroids)
    # materialize the trained centroids ONCE: the centroids write and the
    # assignments write are two separate actions, and without this each
    # re-runs the entire Lloyd chain (double build cost, and two
    # recomputations that must agree bit-for-bit to keep the index
    # internally consistent). A driver roundtrip (k rows of doubles —
    # driver-size by construction) instead of localCheckpoint: truncates
    # the lineage just the same, but leaves NO cached blocks behind and
    # cannot hit a missing-unreplicated-block failure on executor loss.
    centroids = _driver_roundtrip(spark, centroids)
    final = _assign(emb, centroids)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    # cluster-local layout: assignments are HIVE-PARTITIONED by cluster_id
    # (k directories — k is small by construction), so a probe's isin
    # filter on cluster_id becomes a partition filter at planning time and
    # non-probed clusters' files are never opened. repartition first so
    # each cluster is written by one task -> one file per directory.
    # The vector norm is materialized INTO the index (one fold per vector
    # at build time) so every probe skips the per-candidate-row norm fold
    # — the index is built once, probed many times.
    (
        final.withColumn("nrm", F.expr(_norm("embedding")))
        .repartition("cluster_id")
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(f"{path}/assignments")
    )


def ivf_probe(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    topk: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for each query row, scanning only the
    `nprobe` nearest clusters per query.

    NOT fully lazy: computing the partition-pruning filter requires the
    probed cluster ids on the driver, so this call runs one Spark job
    (the queries x centroids assignment) before returning. The probe
    table it materializes stays persisted (MEMORY_AND_DISK, lineage
    intact — an executor loss recomputes it rather than failing) and is
    annotated on the result: call `cacheutil.release(result)` once the
    result is consumed; any later action then just recomputes through
    the lineage."""
    from pyspark import StorageLevel

    from bdt_spark.operators.cacheutil import transfer_ownership

    centroids = spark.read.parquet(f"{path}/centroids")
    assignments = spark.read.parquet(f"{path}/assignments")
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )

    d = F.expr(_dist2("q_vec", "centroid"))
    w = Window.partitionBy("q_id").orderBy(
        F.round(d, 9).asc(), F.col("cluster_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
        .select("q_id", "q_vec", "cluster_id")
        # computed once: consumed by BOTH the probed-cluster-id collect
        # below and the candidate join — without the cache the queries x
        # centroids assignment would run twice. persist (not
        # localCheckpoint): lineage stays intact, so a lost block
        # recomputes instead of failing the probe; the collect below is
        # the action that populates the cache.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the distinct probed clusters are <= min(k, queries*nprobe) rows —
    # driver-safe at any corpus size. Pushing them as an isin filter turns
    # into a PARTITION filter on the hive layout build_ivf_index writes,
    # so the scan opens only the probed clusters' files (proved by
    # executed-scan metrics in tests/test_ann.py); on a legacy
    # non-partitioned layout the same filter still prunes row groups via
    # the sorted min/max stats.
    probe_ids = [
        r.cluster_id for r in probes.select("cluster_id").distinct().collect()
    ]
    pruned = (
        assignments.filter(F.col("cluster_id").isin(probe_ids))
        if probe_ids
        else assignments.filter(F.lit(False))
    )
    if "nrm" not in pruned.columns:  # pre-norm legacy layout
        pruned = pruned.withColumn("nrm", F.expr(_norm("embedding")))
    inc_path = f"{path}/increments"
    if _hadoop_exists(spark, inc_path):
        # live increments (update_ivf_index batches not yet compacted):
        # union them into the candidate set under the SAME cluster_id
        # pruning — one directory level deeper, still a partition
        # filter — then resolve latest-batch-wins per vec_id over the
        # PRUNED rows only (base sorts as batch '', below every
        # increment id), so a replayed or re-ingested id scores once.
        # The resolution shuffle is candidate-sized (nprobe clusters),
        # never corpus-sized; base-only indexes skip this block
        # entirely. Caveat: a CHANGED re-ingested vector that moved
        # cluster resolves correctly only when its new cluster is
        # probed or after compact_ivf_index — same contract as the
        # dedup state's compaction note.
        from bdt_spark.operators.dedup import _read_state_untyped

        inc = _read_state_untyped(spark, inc_path)
        inc_pruned = (
            # raw string comparison: with inference pinned off both
            # partition columns read as strings, so the filter stays a
            # partition filter at planning time
            inc.filter(F.col("cluster_id").isin([str(c) for c in probe_ids]))
            if probe_ids
            else inc.filter(F.lit(False))
        )
        both = (
            pruned.select("vec_id", "embedding", "nrm", "cluster_id")
            .withColumn("batch", F.lit(""))
            .unionByName(
                inc_pruned.select(
                    "vec_id",
                    "embedding",
                    "nrm",
                    F.col("cluster_id").cast("int").alias("cluster_id"),
                    "batch",
                )
            )
        )
        pruned = (
            both.groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct("embedding", "nrm", "cluster_id"),
                    F.col("batch"),
                ).alias("_s")
            )
            .select("vec_id", "_s.embedding", "_s.nrm", "_s.cluster_id")
        )
    indexed = pruned.withColumnRenamed("nrm", "v_nrm")
    cand = probes.withColumn("q_nrm", F.expr(_norm("q_vec"))).join(
        indexed, "cluster_id"
    ).filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.withColumn(
        "cos_raw", F.expr(_cos_sim_pre("q_vec", "embedding", "q_nrm", "v_nrm"))
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.round(F.col("cos_raw"), 9).desc(), F.col("vec_id").asc()
    )
    result = (
        scored
        # zero-norm vectors (index or query side) have NULL cos_raw: drop
        # them explicitly rather than let NULL ordering misrank them
        .filter(F.col("cos_raw").isNotNull())
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= topk)
        .select(
            "q_id", "vec_id", F.round("cos_raw", 6).alias("cos_sim"), "rk"
        )
        .orderBy("q_id", "rk")
    )
    return transfer_ownership(result, probes)

# canonical home: sources/io.hadoop_exists (streaming sinks import it too)
from bdt_spark.sources.io import hadoop_exists as _hadoop_exists  # noqa: E402


def _centroid_argmin_expr(cent_rows) -> str:
    """Nearest-cluster id as a single ZERO-SHUFFLE projection: the k
    centroid arrays are embedded as double literals (k rows are
    driver-size by construction) and `array_min` over (rounded
    distance, cluster_id) structs reproduces _assign's exact ordering —
    ROUND(d, 9) ascending then cluster_id ascending — without the
    per-vec_id window shuffle. repr() round-trips doubles exactly, so
    the embedded literals are bit-identical to the parquet centroid
    values and the two assignment paths agree (pinned in
    tests/test_ann.py)."""
    structs = []
    for r in sorted(cent_rows, key=lambda x: x["cluster_id"]):
        arr = (
            "array("
            + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in r["centroid"])
            + ")"
        )
        structs.append(
            f"named_struct('d', ROUND({_dist2('embedding', arr)}, 9),"
            f" 'c', {int(r['cluster_id'])})"
        )
    return f"array_min(array({', '.join(structs)})).c"


def update_ivf_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    batch_id: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
    skew_threshold: float = 4.0,
) -> str:
    """Fold one NEW batch of vectors into the persisted IVF index
    without retraining or rescanning the corpus; returns the batch_id.

    The batch is assigned to the EXISTING centroids with the
    zero-shuffle argmin projection (_centroid_argmin_expr — per-batch
    ingest cost is one map-only pass over the batch), its norms are
    materialized like the base build's, and the rows land in
    `{path}/increments/batch=<id>/cluster_id=N/` via dynamic partition
    overwrite — replaying a batch_id overwrites exactly its own
    partitions, so at-least-once delivery converges to exactly-once
    index state (the dedup-state contract; pass monotonically ordered
    batch_ids if re-ingesting CHANGED vectors, so latest-wins means
    newest). Probes see increments immediately (ivf_probe unions them
    under the same cluster pruning); run compact_ivf_index offline to
    fold them into the cluster-local base layout.

    Assignment quality degrades as the data distribution drifts from
    the frozen centroids — pass a `stats` dict to receive
    {"assigned": n, "cluster_counts": ..., "skew": max/mean,
    "recluster_recommended": bool} (footer-derived, no extra job) and
    re-train with build_ivf_index when recluster_recommended."""
    import uuid

    if batch_id is None:
        batch_id = uuid.uuid4().hex[:12]
    emb = batch.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    [dup_check] = (
        emb.agg(
            F.count("*").alias("n"),
            F.countDistinct("vec_id").alias("d"),
        ).collect()
    )
    if dup_check.n != dup_check.d:
        raise ValueError(
            f"{id_col!r} must be unique within the batch: {dup_check.n} "
            f"rows but only {dup_check.d} distinct ids"
        )
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()  # k rows
    if not cent_rows:
        raise ValueError(f"no centroids at {path}/centroids — build first")
    rows = emb.selectExpr(
        "vec_id",
        "embedding",
        f"{_norm('embedding')} AS nrm",
        f"{_centroid_argmin_expr(cent_rows)} AS cluster_id",
    )
    (
        rows.withColumn("batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cluster_id")
        .parquet(f"{path}/increments")
    )
    if stats is not None:
        stats["assigned"] = dup_check.n
        stats.update(ivf_index_stats(path, skew_threshold=skew_threshold))
    return batch_id


def compact_ivf_index(spark: SparkSession, path: str) -> int:
    """Fold every increment batch back into the cluster-local base
    layout (`assignments/cluster_id=N/`, one file per cluster) so probe
    pruning stays one partition level and the per-probe latest-wins
    resolution is skipped again. Latest-batch-wins per vec_id — the
    base sorts as batch '' below every increment. Returns the number of
    increment batches folded (0 = nothing to do).

    Offline maintenance ordering: the merged layout is written to a
    side directory, swapped in via rename, and the old base +
    increments deleted LAST — a crash after the swap leaves increments
    whose rows duplicate the new base identically, which the probe's
    latest-wins already resolves; a failed rename/delete raises rather
    than leaving a half-swapped index. Do not run concurrently with
    update_ivf_index."""
    from bdt_spark.operators.dedup import _read_state_untyped

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    inc_path = f"{path}/increments"
    if not fs.exists(jvm_path(inc_path)):
        return 0
    inc = _read_state_untyped(spark, inc_path)
    n_batches = inc.select("batch").distinct().count()
    base = spark.read.parquet(f"{path}/assignments")
    if "nrm" not in base.columns:  # legacy pre-norm layout: upgrade
        base = base.withColumn("nrm", F.expr(_norm("embedding")))
    merged = (
        base.select("vec_id", "embedding", "nrm", "cluster_id")
        .withColumn("batch", F.lit(""))
        .unionByName(
            inc.select(
                "vec_id",
                "embedding",
                "nrm",
                F.col("cluster_id").cast("int").alias("cluster_id"),
                "batch",
            )
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("embedding", "nrm", "cluster_id"), F.col("batch")
            ).alias("_s")
        )
        .select("vec_id", "_s.embedding", "_s.nrm", "_s.cluster_id")
    )
    tmp = f"{path}/assignments__compact"
    old = f"{path}/assignments__old"
    (
        merged.repartition("cluster_id")
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(tmp)
    )
    if fs.exists(jvm_path(old)):
        fs.delete(jvm_path(old), True)
    if not fs.rename(jvm_path(f"{path}/assignments"), jvm_path(old)):
        raise IOError(f"compact_ivf_index: failed to move old base at {path}")
    if not fs.rename(jvm_path(tmp), jvm_path(f"{path}/assignments")):
        raise IOError(f"compact_ivf_index: failed to swap new base at {path}")
    for p in (old, inc_path):
        if fs.exists(jvm_path(p)) and not fs.delete(jvm_path(p), True):
            raise IOError(
                f"compact_ivf_index: failed to delete {p}; duplicate "
                "rows would remain (probe latest-wins still resolves "
                "them, but the layout is not compact)"
            )
    return n_batches


def ivf_index_stats(path: str, skew_threshold: float = 4.0) -> dict:
    """Per-cluster row counts and skew for a persisted IVF index, read
    from parquet FOOTERS on the driver (no Spark job — the same
    metadata-peek pattern as io._parquet_scan_splits). Counts are
    physical rows (base + increments; an id re-ingested across batches
    counts each version until compaction — the gate is a heuristic, not
    an exact census). skew = max/mean cluster count;
    recluster_recommended flips when it crosses `skew_threshold`:
    frozen centroids stop fitting a drifted distribution, and the
    symptom is exactly a hot cluster that makes probes scan a
    corpus-sized bucket again."""
    import os

    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for sub in ("assignments", "increments"):
        root = os.path.join(path, sub)
        if not os.path.isdir(root):
            continue
        for dirpath, dirs, files in os.walk(root):
            dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
            cid = None
            for comp in dirpath.split(os.sep):
                if comp.startswith("cluster_id="):
                    cid = int(comp[len("cluster_id="):])
            if cid is None:
                continue
            for f in files:
                if f.endswith((".parquet", ".parq")) and not f.startswith(
                    ("_", ".")
                ):
                    n = pq.read_metadata(os.path.join(dirpath, f)).num_rows
                    counts[cid] = counts.get(cid, 0) + n
    total = sum(counts.values())
    skew = (
        max(counts.values()) / (total / len(counts))
        if counts and total
        else 0.0
    )
    return {
        "cluster_counts": counts,
        "skew": skew,
        "skew_threshold": skew_threshold,
        "recluster_recommended": skew >= skew_threshold,
    }
