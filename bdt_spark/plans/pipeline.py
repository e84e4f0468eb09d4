"""LLM-training-data-pipeline operators (dedup / similarity / text analysis).

These extend the reference's surface (BASELINE.json north_star): the reference
is a generic SQL frontend (ctx.sql, reference src/bin/main.rs:182); a modern
100 TB training-data pipeline needs first-class dedup, ANN similarity, and
text-quality operators. Each is expressed Spark-declaratively so Catalyst
plans it (no driver loops), and each SQL-expressible one carries a DuckDB
oracle in its own dialect for the correctness gate.

Cross-engine determinism:
- All "random" hash families are MD5-derived (identical hex output in both
  engines); min-hash uses the lexicographic min of md5 hex strings (a valid
  uniform permutation min).
- Hex->int: Spark `CONV(h,16,10)` vs DuckDB `CAST('0x'||h AS BIGINT)`.
- Float math is pinned to DOUBLE with sequential folds on both sides
  (Spark `aggregate`, DuckDB `list_reduce`), rounded before hashing.

Scale design (100 TB):
- MinHash LSH: linear map-side shingle+signature pass, shuffle only on
  (band, bucket-key) — near-uniform keys; candidate verification touches
  only bucket-collision pairs, never O(n^2).
- SimHash: one narrow shuffle on (doc_id) for the bit-vote aggregation,
  then an exact groupBy on the 16-bit fingerprint.
- ANN: query side is tiny -> broadcast; corpus scan stays partitioned
  (brute force), or hyperplane-LSH buckets co-partition candidates.
- n-gram Jaccard stays *blocked* (lang) — the O(n^2) stays inside
  blocks, with MinHash-LSH as the declared candidate source at scale.
  Embedding cosine near-dup runs on sparse sign-LSH bucketed candidates
  with an in-bucket spanning window (linear in corpus size, no label
  skew sensitivity) — see _cosine_neardup_sql.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdt_spark.plans.registry import dsum, isum, query, sql_query
from bdt_spark.sources.io import load_fixture_tables

# ---------------------------------------------------------------------------
# helpers: per-dialect SQL fragments
# ---------------------------------------------------------------------------

K_HASH = 8          # minhash signature length
N_BANDS = 4         # LSH bands (rows per band = K_HASH / N_BANDS = 2)
JACCARD_T = 0.5     # verification threshold
SIM_BITS = 16       # simhash fingerprint width


def _spark_shingles(src: str = "text") -> str:
    """Distinct word 3-shingles of lower(text) — Spark dialect.

    Built with zip_with over shifted slices rather than indexed element_at
    inside a transform lambda: the naive form re-evaluates split() for
    every element access (~3x shingle count per doc); this form references
    the split array ~5x per DOC. zip_with pads the shorter side with null
    and concat propagates null, so the trailing partial shingles drop out
    in the filter."""
    w = f"split(lower({src}), ' ')"
    return (
        f"array_distinct(filter(zip_with("
        f"zip_with({w}, slice({w}, 2, size({w})), (x, y) -> concat(x, ' ', y)),"
        f" slice({w}, 3, size({w})), (x, y) -> concat(x, ' ', y)),"
        f" x -> x IS NOT NULL))"
    )


def _duck_shingles(src: str = "text") -> str:
    w = f"string_split(lower({src}), ' ')"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({w}) - 2, 1) + 1),"
        f" i -> {w}[i] || ' ' || {w}[i + 1] || ' ' || {w}[i + 2]))"
    )


N_MD5_SEEDS = K_HASH // 4  # each md5 digest yields four 8-hex-char lanes


def _shingles(dialect: str) -> str:
    return _spark_shingles() if dialect == "spark" else _duck_shingles()


def _shingle_stream(dialect: str) -> str:
    """explode_OUTER, not explode: plain explode implies a size(arr)>0
    filter that Catalyst pushes into the scan — re-evaluating the whole
    interpreted shingle expression a second time per row (measured 2x
    the query cost at sf1). The outer form's empty-array NULL rows never
    survive the downstream equi joins, so results are identical."""
    return "explode_outer(shingles)" if dialect == "spark" else "unnest(shingles)"


def _word_stream(dialect: str) -> str:
    """Lower-cased, space-split word-stream expression (one row per word
    occurrence) — the whitespace tokenizer shared by every word-level
    text query. One definition per dialect so a query and its oracle can
    never tokenize differently (r10 consolidation of 7 inline copies)."""
    if dialect == "spark":
        return "explode(split(lower(text), ' '))"
    return "unnest(string_split(lower(text), ' '))"


def _md5_cols(dialect: str, k_hash: int = K_HASH) -> str:
    """One md5 digest per (shingle row, seed) — computed once per row, in
    relational (exploded) form so no engine re-evaluates the hash per lane."""
    n_seeds = k_hash // 4
    if dialect == "spark":
        return ", ".join(
            f"md5(concat('{i}#', s)) AS m{i}" for i in range(n_seeds)
        )
    return ", ".join(f"md5('{i}#' || s) AS m{i}" for i in range(n_seeds))


def _lane_mins(dialect: str, k_hash: int = K_HASH) -> str:
    """MIN per 8-hex digest lane -> k_hash minhash values. As a grouped
    aggregate this gets map-side partial MINs in Spark — the shuffle
    carries k_hash small strings per doc per partition, not the shingles."""
    fn = "substring" if dialect == "spark" else "substr"
    out = []
    for j in range(k_hash):
        seed, lane = divmod(j, 4)
        out.append(f"MIN({fn}(m{seed}, {lane * 8 + 1}, 8)) AS h{j}")
    return ",\n         ".join(out)


def _band_keys(dialect: str, k_hash: int = K_HASH, n_bands: int = N_BANDS) -> str:
    rows = k_hash // n_bands
    parts = []
    for b in range(n_bands):
        sig = ", ".join(f"h{b * rows + r}" for r in range(rows))
        if dialect == "spark":
            parts.append(f"concat('b{b}:', md5(concat({sig})))")
        else:
            sig_cat = " || ".join(f"h{b * rows + r}" for r in range(rows))
            parts.append(f"'b{b}:' || md5({sig_cat})")
    arr = ", ".join(parts)
    return f"array({arr})" if dialect == "spark" else f"[{arr}]"


def _minhash_lsh_sql(
    dialect: str, k_hash: int = K_HASH, n_bands: int = N_BANDS
) -> str:
    """Full MinHash-LSH near-dup pair detection, one SQL text per dialect,
    generated for any (k_hash, n_bands) geometry from the same template."""
    spark = dialect == "spark"
    shingles = _shingles(dialect)
    bkeys = _band_keys(dialect, k_hash, n_bands)
    explode = f"explode({bkeys})" if spark else f"unnest({bkeys})"
    if spark:
        jac = (
            "ROUND(size(array_intersect(sa.shingles, sb.shingles)) /"
            " CAST(size(array_union(sa.shingles, sb.shingles)) AS DOUBLE), 6)"
        )
    else:
        jac = (
            "ROUND(len(list_intersect(sa.shingles, sb.shingles)) /"
            " CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE), 6)"
        )
    if spark:
        # map-only signatures: per-seed digest arrays via transform, lane
        # mins via array_min — zero shuffle between the scan and the band-
        # bucket exchange (the explode->GROUP BY form pays a doc_id
        # shuffle for the same result; min over identical values)
        digests = ", ".join(
            f"transform(shingles, s -> md5(concat('{i}#', s))) AS d{i}"
            for i in range(k_hash // 4)
        )
        lanes = ",\n         ".join(
            f"array_min(transform(d{j // 4}, x -> substring(x,"
            f" {(j % 4) * 8 + 1}, 8))) AS h{j}"
            for j in range(k_hash)
        )
        sig_ctes = f"""
    digests AS (
      SELECT doc_id, {digests} FROM sh
    ),
    sig AS (
      SELECT doc_id,
         {lanes}
      FROM digests
    ),"""
    else:
        sig_ctes = f"""
    exploded AS (
      SELECT doc_id, unnest(shingles) AS s
      FROM sh
    ),
    hashed AS (
      SELECT doc_id, {_md5_cols(dialect, k_hash)} FROM exploded
    ),
    sig AS (
      SELECT doc_id,
         {_lane_mins(dialect, k_hash)}
      FROM hashed GROUP BY doc_id
    ),"""
    from bdt_spark.operators.dedup import HOT_BUCKET_CAP

    return f"""
    WITH sh AS (
      SELECT doc_id, {shingles} AS shingles FROM documents
    ),{sig_ctes}
    buckets AS (
      SELECT doc_id, {explode} AS bkey FROM sig
    ),
    capped AS (
      -- model the Spark operator's hot-bucket cap (operators/dedup.py):
      -- band buckets with more than HOT_BUCKET_CAP members are dropped
      -- before pairing, so the oracle agrees even when the cap triggers
      SELECT doc_id, bkey FROM buckets
      WHERE bkey NOT IN (
        SELECT bkey FROM buckets GROUP BY bkey
        HAVING COUNT(*) > {HOT_BUCKET_CAP}
      )
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT doc_a, doc_b, {jac} AS jaccard
      FROM cand
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM verified
    WHERE jaccard >= {JACCARD_T}
    ORDER BY doc_a, doc_b
    """


@query(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_sql("duck"),
    tags=("dedup", "lsh", "minhash"),
    doc=(
        "Near-duplicate pairs via MinHash LSH: word-3-shingles -> "
        f"{K_HASH}-hash signature (per-lane min of seeded md5 digests) -> "
        f"{N_BANDS} bands -> bucket self-join -> exact-Jaccard verification "
        f"at >= {JACCARD_T}. The shingle and signature DataFrames are "
        "persisted because the DAG reuses them on both sides of the bucket "
        "self-join and the verify join — without it Catalyst recomputes the "
        "shingling 4x (measured 18x slowdown at sf0.1). At 100 TB the same "
        "intermediates go to persist(DISK_ONLY) or a checkpoint table; "
        "everything else is one explode + one partial-agg shuffle on doc_id "
        "+ one shuffle on band keys; verification touches only candidate "
        "pairs, never O(n^2)."
    ),
)
def dedup_minhash_lsh(spark, sf_dir):
    # canonical implementation lives in operators/dedup.py (parameterized
    # by column names so the CLI can dedup any table); this query pins its
    # semantics to the DuckDB oracle on the fixture documents table
    from bdt_spark.operators.dedup import minhash_pairs

    t = load_fixture_tables(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return minhash_pairs(
        t["documents"],
        id_col="doc_id",
        text_col="text",
        threshold=JACCARD_T,
        n_partitions=n_part,
    )

@query(
    "dedup_minhash_lsh_k64",
    oracle=_minhash_lsh_sql("duck", 64, 16),
    tags=("dedup", "lsh", "minhash"),
    doc=(
        "dedup_minhash_lsh at the PRODUCTION geometry: 64-hash signatures "
        "in 16 bands of 4 rows (S-curve threshold (1/16)^(1/4) ~ 0.5, "
        "matching the verify threshold; per-pair collision estimator sd "
        "~ sqrt(J(1-J)/64) ~ 0.06 vs the toy 8-hash geometry's 0.18). "
        "The toy geometry stays as the fast default query; this one pins "
        "the parameterized operator (operators/dedup.py minhash_pairs "
        "k_hash/n_bands) against an oracle GENERATED FROM THE SAME "
        "TEMPLATE at 64/16 — closing the gap where production geometry "
        "was property-tested but never hash-oracled."
    ),
)
def dedup_minhash_lsh_k64(spark, sf_dir):
    from bdt_spark.operators.dedup import minhash_pairs

    t = load_fixture_tables(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return minhash_pairs(
        t["documents"],
        id_col="doc_id",
        text_col="text",
        threshold=JACCARD_T,
        n_partitions=n_part,
        k_hash=64,
        n_bands=16,
    )


# --- exact dedup ------------------------------------------------------------

sql_query(
    "dedup_exact_text",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
    FROM corpus
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY text_hash
    """,
    tags=("dedup", "exact"),
    doc="Exact dedup: hash-groupBy on md5(text); survivors = MIN(doc_id). "
    "Map-side partial agg then one shuffle on the hash — the canonical "
    "exact-dedup plan at any scale. The sf0.01 fixture is duplicate-free "
    "(500 unique texts), which made the original query vacuously empty; "
    "the corpus CTE re-inserts every 25th doc under a shifted id so the "
    "HAVING>1 groups and MIN-survivor logic are exercised with a "
    "deterministic 20-group result at the driver's sf.",
)

_NORM_DEDUP_CORPUS = """
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || '!!' AS text
      FROM documents WHERE doc_id % 25 = 3
    )
"""

sql_query(
    "dedup_exact_normalized",
    f"""
    WITH {_NORM_DEDUP_CORPUS}
    SELECT norm_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
    FROM (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z0-9 ]', '')) AS norm_hash
      FROM corpus) t
    GROUP BY norm_hash
    HAVING COUNT(*) > 1
    ORDER BY norm_hash
    """,
    oracle=f"""
    WITH {_NORM_DEDUP_CORPUS}
    SELECT norm_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
    FROM (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS norm_hash
      FROM corpus) t
    GROUP BY norm_hash
    HAVING COUNT(*) > 1
    ORDER BY norm_hash
    """,
    tags=("dedup", "exact"),
    doc="Exact dedup after lowercase+strip-punctuation normalization. The "
    "injected copies are UPPERCASED with trailing punctuation, so they "
    "collide ONLY under normalization (dedup_exact_text's raw-hash query "
    "does not see them) — the pair of queries discriminates raw-vs-"
    "normalized semantics on a fixture that is otherwise duplicate-free "
    "at sf<=0.01.",
)


# --- simhash ----------------------------------------------------------------


def _simhash_sql(dialect: str) -> str:
    spark = dialect == "spark"
    if spark:
        hexint = "CAST(CONV(SUBSTR(MD5(word), 1, 8), 16, 10) AS BIGINT)"
        shift = lambda b: f"(SHIFTRIGHT(hv, {b}) & 1)"  # noqa: E731
    else:
        hexint = "CAST('0x' || SUBSTR(MD5(word), 1, 8) AS BIGINT)"
        shift = lambda b: f"((hv >> {b}) & 1)"  # noqa: E731
    explode = _word_stream(dialect)
    # votes are weighted by per-doc word count: hashing DISTINCT (doc, word)
    # pairs instead of every occurrence cuts the md5+conv work and the rows
    # entering the 16-column vote aggregate by the repetition factor
    # (identical result; measured 2.6x cold at sf0.1)
    votes = ",\n             ".join(
        f"SUM(n * CASE WHEN {shift(b)} = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIM_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIM_BITS)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, {explode} AS word FROM documents
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
    ),
    h AS (
      SELECT doc_id, n, {hexint} AS hv FROM wc
    ),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM h GROUP BY doc_id
    )
    SELECT CAST({fp} AS BIGINT) AS simhash,
           COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM votes
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY simhash
    """


sql_query(
    "dedup_simhash",
    _simhash_sql("spark"),
    oracle=_simhash_sql("duck"),
    tags=("dedup", "simhash"),
    doc=f"{SIM_BITS}-bit SimHash fingerprint (md5-derived bit votes over "
    "words); groups sharing a fingerprint are near-dup clusters. One narrow "
    "shuffle on doc_id, one on the fingerprint.",
)


# --- n-gram Jaccard (blocked pairwise) --------------------------------------


def _ngram_jaccard_sql(dialect: str) -> str:
    spark = dialect == "spark"
    shingles = _shingles(dialect)
    if spark:
        jac = (
            "ROUND(size(array_intersect(a.shingles, b.shingles)) /"
            " CAST(size(array_union(a.shingles, b.shingles)) AS DOUBLE), 6)"
        )
    else:
        jac = (
            "ROUND(len(list_intersect(a.shingles, b.shingles)) /"
            " CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE), 6)"
        )
    return f"""
    WITH sh AS (
      SELECT doc_id, lang, {shingles} AS shingles
      FROM documents WHERE doc_id < 2000
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {jac} AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM pairs
    WHERE jaccard >= 0.2
    ORDER BY doc_a, doc_b
    """


sql_query(
    "dedup_ngram_jaccard",
    _ngram_jaccard_sql("spark"),
    oracle=_ngram_jaccard_sql("duck"),
    tags=("dedup", "jaccard"),
    doc="Blocked pairwise 3-gram Jaccard (block = lang). The O(n^2) stays "
    "inside blocks; at scale the MinHash-LSH query supplies candidates "
    "instead of the block cross-join. The doc_id cut (2000) covers the "
    "whole sf0.01 corpus — the fixture's 6 genuine near-dup pairs all "
    "survive the 0.2 threshold (the previous <200 cut excluded every one, "
    "leaving a vacuous empty oracle) — while still bounding the in-block "
    "pair count at larger sf.",
)


# --- embedding cosine (near-dup + ANN) --------------------------------------


EMB_DIM = 64  # fixture embedding dimensionality (TESTDATA.md contract);
# the flat unrolled expressions below are generated for this length.
# CAUTION: out-of-range array indexing yields NULL identically in both
# engines, so a regenerated fixture with a different dim would fail
# SILENTLY AND SYMMETRICALLY (oracle still matches while both engines
# compute truncated dots). tests/test_queries.py pins every fixture sf's
# actual embedding length to EMB_DIM so that drift is caught loudly.


def _dot(dialect: str, a: str, b: str) -> str:
    """Deterministic double-precision dot product — delegates to the ONE
    unrolled-chain generator in operators/dedup.py (flat_dot_sql) so the
    oracle's cosine and the Spark operator's cosine cannot drift in IEEE
    accumulation order (see flat_dot_sql for the codegen rationale)."""
    from bdt_spark.operators.dedup import flat_dot_sql

    return flat_dot_sql(a, b, EMB_DIM, one_based=dialect != "spark")


def _norm(dialect: str, e: str) -> str:
    """Euclidean norm — same shared generator (see _dot).

    The similarity queries project this ONCE per vector row before any
    pair-building join, so it runs O(n) times instead of O(pairs)."""
    from bdt_spark.operators.dedup import flat_norm_sql

    return flat_norm_sql(e, EMB_DIM, one_based=dialect != "spark")


def _cos_pre(dialect: str, a: str, b: str, a_nrm: str, b_nrm: str) -> str:
    """Cosine from a fresh dot product and two PREcomputed norm columns."""
    return f"({_dot(dialect, a, b)} / ({a_nrm} * {b_nrm}))"


# --- sparse sign-LSH geometry for corpus-wide near-dup ----------------------
#
# The 4-dense-plane bucketing below (_plane_bucket_expr, 16 buckets) is the
# right shape for PROBE-style ANN (a handful of query vectors against one
# bucket each) but is hopeless as a corpus-wide near-dup blocker: 16 buckets
# over a 210k-vector sf10 corpus puts ~13k vectors in every bucket and the
# bucket self-join is quadratic again. Corpus-wide candidate generation
# needs a bucket space that GROWS with the corpus: NEARDUP_PLANES sign bits
# per band (2^24 buckets) x NEARDUP_BANDS independent bands (OR-construction
# for recall). Planes are SPARSE +/-1 hyperplanes (Achlioptas-style random
# projections: density 8/64): each plane dot is 8 adds of directly-indexed
# array elements — a flat, codegen-friendly arithmetic expression in both
# engines, no higher-order-function lambda per element (the HOF fold cost
# is what made dense per-plane dots the dominant term at sf10).
# Measured on the sf10 corpus (210k vectors, tools/gen_scale.py replication):
# candidate precision 0.998 at r=24, injected-near-dup recall 0.99+ with 2
# bands at per-plane sign agreement 0.99.

from bdt_spark.operators.dedup import (  # noqa: E402 — geometry lives
    # with the operator; BOTH dialects' SQL below is generated from the
    # same plane table the Spark operator uses, so they cannot drift
    NEARDUP_BANDS,
    NEARDUP_NNZ,
    NEARDUP_PLANES,
    NEARDUP_RUNGS,
    NEARDUP_WINDOW,
    sparse_band_bucket_sql,
    sparse_planes,
)

# back-compat aliases (tests and older call sites)
_sparse_planes = sparse_planes


def _sparse_band_bucket(dialect: str, band_planes) -> str:
    return sparse_band_bucket_sql(
        band_planes, "embedding", one_based=dialect != "spark"
    )


def _cosine_neardup_sql(dialect: str = "duck") -> str:
    """DuckDB ORACLE for corpus-wide embedding near-dup via sparse
    sign-LSH buckets + an in-bucket spanning window — the plan that
    survives 100x. The SPARK side is operators/dedup.py
    embedding_neardup_pairs (plus the _NEARDUP_CORPUS_SPARK injection);
    this text is generated from the SAME plane table and geometry
    constants, so the two cannot drift. `dialect` is retained for the
    callers' clarity but only "duck" is supported now that the Spark
    side is the operator.

    Earlier rounds blocked on `label` and ran all-pairs inside each block:
    O(n^2) on a skewed label, and the sf10 corpus (100 near-identical
    replicas per source vector) made even the TRUE pair list quadratic —
    ~11M pairs of C(100,2) cliques. Near-dup DEDUP doesn't need the
    exhaustive pair list, it needs a pair set that (a) contains only
    verified near-dups and (b) SPANS every near-dup group so connected
    components are preserved. So: bucket on NEARDUP_BANDS independent
    24-bit sparse sign-LSH keys, then pair each bucket member with at most
    NEARDUP_WINDOW in-bucket predecessors (by vec_id rank). A k-clique
    that lands in one bucket yields a connected chain of k-1+ verified
    edges instead of C(k,2); total candidates are <= n * bands * window —
    LINEAR in corpus size with no skew sensitivity, and the hot-bucket cap
    (shared with MinHash-LSH) still bounds any adversarial bucket.
    Verified geometry on the sf10 corpus: candidate precision 0.998,
    injected-pair recall 0.99+."""
    if dialect != "duck":
        raise ValueError(
            "spark dialect removed: the Spark side is "
            "operators/dedup.py embedding_neardup_pairs"
        )
    cos = _cos_pre(dialect, "a.embedding", "b.embedding", "a.nrm", "b.nrm")
    # The fixture's max organic pair cosine is ~0.475 at sf0.01, so a 0.9
    # near-dup threshold was vacuously empty at the driver's sf. The
    # injected rows re-insert every 20th vector with even-index dims
    # scaled by 1.1 — cosine vs the source lands at ~0.9989 (non-trivial:
    # direction changes, so the query must actually normalize), while
    # injected-vs-other pairs stay far below threshold. Deterministic
    # double arithmetic; _NEARDUP_CORPUS_SPARK is the Spark-dialect twin
    # of this injection (kept textually adjacent via the registration
    # below so an edit to one is visibly an edit to both).
    perturbed = (
        "list_transform(range(1, len(embedding) + 1), i ->"
        " CASE WHEN (i - 1) % 2 = 0 THEN CAST(embedding[i] AS DOUBLE)"
        " * 1.1 ELSE CAST(embedding[i] AS DOUBLE) END)"
    )
    planes = _sparse_planes(NEARDUP_BANDS * NEARDUP_PLANES)
    band_cols = ", ".join(
        f"{_sparse_band_bucket(dialect, planes[b * NEARDUP_PLANES:(b + 1) * NEARDUP_PLANES])}"
        f" AS bucket{b}"
        for b in range(NEARDUP_BANDS)
    )
    # band b's keys are disambiguated into one BIGINT space: b * 2^P + key
    band_union = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {b} * {1 << NEARDUP_PLANES} + bucket{b} AS bkey"
        " FROM v"
        for b in range(NEARDUP_BANDS)
    )
    from bdt_spark.operators.dedup import HOT_BUCKET_CAP

    return f"""
    WITH corpus AS (
      SELECT vec_id, label, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, label, {perturbed} AS embedding
      FROM embeddings WHERE vec_id % 20 = 0
    ),
    v AS (
      SELECT vec_id, embedding,
             {_norm(dialect, "embedding")} AS nrm,
             {band_cols}
      FROM corpus
    ),
    buckets AS (
{band_union}
    ),
    capped AS (
      -- same hot-bucket cap as MinHash-LSH (operators/dedup.py), modeled
      -- here so the oracle agrees when the cap triggers
      SELECT vec_id, bkey FROM buckets
      WHERE bkey NOT IN (
        SELECT bkey FROM buckets GROUP BY bkey
        HAVING COUNT(*) > {HOT_BUCKET_CAP}
      )
    ),
    ranked AS (
      SELECT vec_id, bkey,
             ROW_NUMBER() OVER (PARTITION BY bkey ORDER BY vec_id) AS rk
      FROM capped
    ),
    cand AS (
      -- spanning window + log rungs: each member pairs with <=
      -- {NEARDUP_WINDOW} contiguous in-bucket predecessors (keeps any
      -- <= {NEARDUP_WINDOW}-way interleaved clique connected) PLUS the
      -- rungs at rank distances 16*k, k=1..{NEARDUP_WINDOW}: under any
      -- k-way round-robin interleave (k <= {NEARDUP_WINDOW}) the 16*k
      -- rung is an in-clique 16-member jump, so the component diameter
      -- stays ~members/16 and the min-label loop and recursive-CTE
      -- oracle converge in a handful of iterations on 100-replica
      -- cliques. Still <= {NEARDUP_WINDOW} + {len(NEARDUP_RUNGS)}
      -- candidates per member — LINEAR in corpus size
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM ranked a JOIN ranked b
        ON a.bkey = b.bkey
       AND b.rk > a.rk
       AND (b.rk - a.rk <= {NEARDUP_WINDOW}
            OR b.rk - a.rk IN ({", ".join(str(r) for r in NEARDUP_RUNGS)}))
    ),
    pairs AS (
      SELECT c.vec_a, c.vec_b, ROUND({cos}, 6) AS cos_sim
      FROM cand c
      JOIN v a ON a.vec_id = c.vec_a
      JOIN v b ON b.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, cos_sim FROM pairs
    WHERE cos_sim >= 0.9
    ORDER BY vec_a, vec_b
    """


_NEARDUP_CORPUS_SPARK = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           transform(embedding, (x, i) -> CASE WHEN i % 2 = 0 THEN
             CAST(x AS DOUBLE) * 1.1 ELSE CAST(x AS DOUBLE) END) AS embedding
    FROM embeddings WHERE vec_id % 20 = 0
"""


@query(
    "dedup_embedding_cosine",
    oracle=_cosine_neardup_sql("duck"),
    tags=("dedup", "embedding", "cosine", "lsh"),
    doc="Embedding near-dup pairs >= 0.9 cosine via sparse sign-LSH "
    f"buckets ({NEARDUP_BANDS} bands x {NEARDUP_PLANES}-bit keys) and an "
    f"in-bucket spanning window ({NEARDUP_WINDOW} predecessors/member): "
    "candidate count is linear in corpus size regardless of label skew or "
    "replica-clique size, every emitted pair is exact-cosine verified, and "
    "the pair set spans each bucket-coherent near-dup group so downstream "
    "connected components (dedup_semantic_clusters) are preserved. "
    "Replaces the r6 label-blocked all-pairs form whose in-block O(n^2) "
    "could not survive a skewed label at 100x. Spark side = the canonical "
    "operators/dedup.py embedding_neardup_pairs (persisted single "
    "materialization of the bucketed projection — the SQL-CTE form "
    "re-planned that subtree per consumer, ~45 exchanges at sf0.1); the "
    "DuckDB oracle is generated from the SAME plane table and geometry "
    "constants, so operator and oracle cannot drift.",
)
def dedup_embedding_cosine(spark, sf_dir):
    from bdt_spark.operators.dedup import embedding_neardup_pairs

    load_fixture_tables(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    corpus = spark.sql(_NEARDUP_CORPUS_SPARK)
    return embedding_neardup_pairs(corpus, n_partitions=n_part)


def _topk_bruteforce_sql(dialect: str) -> str:
    cos = _cos_pre(dialect, "q.embedding", "c.embedding", "q.nrm", "c.nrm")
    # REPARTITION: one-file corpus = one partition; without it the whole
    # query x corpus scoring runs as a single task (see _cosine_neardup_sql)
    hint = "/*+ REPARTITION(32) */ " if dialect == "spark" else ""
    return f"""
    WITH v AS (
      SELECT {hint}vec_id, embedding, {_norm(dialect, "embedding")} AS nrm
      FROM embeddings
    ),
    queries AS (
      SELECT vec_id AS q_id, embedding, nrm FROM v WHERE vec_id < 5
    ),
    pairs AS (
      SELECT q.q_id, c.vec_id, {cos} AS cos_raw
      FROM queries q
      JOIN v c ON c.vec_id <> q.q_id
    ),
    scored AS (
      SELECT q_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_raw DESC, vec_id) AS rk
      FROM pairs
    )
    SELECT q_id, vec_id, ROUND(cos_raw, 6) AS cos_sim, rk
    FROM scored WHERE rk <= 10
    ORDER BY q_id, rk
    """


sql_query(
    "similarity_topk_bruteforce",
    _topk_bruteforce_sql("spark"),
    oracle=_topk_bruteforce_sql("duck"),
    tags=("similarity", "ann", "topk"),
    doc="Brute-force cosine top-10 for 5 query vectors. The query side is "
    "broadcast (tiny); the corpus scan stays fully partitioned; ranking is a "
    "per-query window — the exact-ANN baseline at any scale.",
)


# Deterministic pseudo-random hyperplanes for sign-LSH, generated once from
# a fixed literal table (md5-free: plain LCG values inlined as SQL literals
# so both engines see identical constants).
def _hyperplanes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    out = []
    state = 88172645463325252
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64 — deterministic, engine-independent (computed here)
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(round((state % 2000003) / 1000001.5 - 1.0, 6))
        out.append(row)
    return out


def _plane_bucket_expr(dialect: str) -> str:
    """Sign-LSH bucket id from the fixed hyperplane table — the ONE
    construction both similarity_lsh_buckets and similarity_topk_lsh use
    (a plane-count or dot-product fix must hit both or their bucketing
    silently desynchronizes). Plane dots are flat unrolled chains like
    _dot (same IEEE order as the HOF fold they replaced)."""
    off = 0 if dialect == "spark" else 1
    planes = _hyperplanes()
    bits = []
    for p, row in enumerate(planes):
        dot = " + ".join(
            f"CAST(embedding[{i + off}] AS DOUBLE) * CAST({v} AS DOUBLE)"
            for i, v in enumerate(row)
        )
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _lsh_bucket_sql(dialect: str) -> str:
    bucket = _plane_bucket_expr(dialect)
    return f"""
    SELECT CAST({bucket} AS INT) AS bucket,
           COUNT(*) AS n_vectors,
           MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
    FROM embeddings
    GROUP BY 1
    ORDER BY bucket
    """


sql_query(
    "similarity_lsh_buckets",
    _lsh_bucket_sql("spark"),
    oracle=_lsh_bucket_sql("duck"),
    tags=("similarity", "ann", "lsh"),
    doc="Sign-LSH bucketing: 4 fixed pseudo-random hyperplanes -> 16 "
    "buckets. At scale, ANN = shuffle corpus once by bucket, probe each "
    "query only against its own bucket (candidates /= 16 per plane-set).",
)


def _lsh_topk_sql(dialect: str) -> str:
    """ANN via LSH: probe only the query's bucket, exact cosine inside."""
    bucket = _plane_bucket_expr(dialect)
    cos = _cos_pre(dialect, "q.embedding", "c.embedding", "q.nrm", "c.nrm")
    # REPARTITION: see _cosine_neardup_sql — avoids a 1-task bucket join
    hint = "/*+ REPARTITION(32) */ " if dialect == "spark" else ""
    return f"""
    WITH bucketed AS (
      SELECT {hint}vec_id, embedding, CAST({bucket} AS INT) AS bucket,
             {_norm(dialect, "embedding")} AS nrm
      FROM embeddings
    ),
    queries AS (
      SELECT vec_id AS q_id, embedding, bucket, nrm
      FROM bucketed WHERE vec_id < 20
    ),
    pairs AS (
      SELECT q.q_id, c.vec_id, {cos} AS cos_raw
      FROM queries q
      JOIN bucketed c ON c.bucket = q.bucket AND c.vec_id <> q.q_id
    ),
    scored AS (
      SELECT q_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_raw DESC, vec_id) AS rk
      FROM pairs
    )
    SELECT q_id, vec_id, ROUND(cos_raw, 6) AS cos_sim, rk
    FROM scored WHERE rk <= 5
    ORDER BY q_id, rk
    """


sql_query(
    "similarity_topk_lsh",
    _lsh_topk_sql("spark"),
    oracle=_lsh_topk_sql("duck"),
    tags=("similarity", "ann", "lsh", "topk"),
    doc="Approximate top-5 neighbors: candidates restricted to the query's "
    "sign-LSH bucket, exact cosine + window rank inside the bucket only.",
)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOPWORDS = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"


def _quality_sql(dialect: str) -> str:
    spark = dialect == "spark"
    if spark:
        nwords = "size(split(text, ' '))"
        nstop = (
            f"size(filter(split(lower(text), ' '), w -> w IN {_STOPWORDS}))"
        )
        nalpha = "length(regexp_replace(text, '[^A-Za-z]', ''))"
        npunct = "length(regexp_replace(text, '[^.,;:!?]', ''))"
    else:
        nwords = "len(string_split(text, ' '))"
        nstop = (
            f"len(list_filter(string_split(lower(text), ' '),"
            f" w -> w IN {_STOPWORDS}))"
        )
        nalpha = "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
        npunct = "length(regexp_replace(text, '[^.,;:!?]', '', 'g'))"
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST({nwords} AS BIGINT) AS n_words,
           ROUND(length(text) / CAST({nwords} AS DOUBLE), 6) AS avg_word_len,
           ROUND({nstop} / CAST({nwords} AS DOUBLE), 6) AS stopword_ratio,
           ROUND({nalpha} / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
           ROUND({npunct} / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
           (length(text) >= 50 AND {nstop} / CAST({nwords} AS DOUBLE) >= 0.01)
             AS passes_quality
    FROM documents
    ORDER BY doc_id
    """


sql_query(
    "text_quality_scores",
    _quality_sql("spark"),
    oracle=_quality_sql("duck"),
    tags=("text", "quality"),
    doc="Per-document quality features (length, word count, stopword/alpha/"
    "punct ratios) + a boolean gate — the C4-style quality filter shape. "
    "Pure map-side, no shuffle.",
)


def _langid_sql(dialect: str) -> str:
    spark = dialect == "spark"
    # Character-n-gram-frequency heuristic: score = count of language-marker
    # substrings. Markers chosen per-language; argmax with deterministic
    # tie-break on marker order.
    markers = {
        "en": ["the ", " and ", "data"],
        "es": ["spark", "row", "valor"],
        "de": ["batch", "join", "und "],
        "fr": ["table", "merge", "les "],
        "zh": ["window", "vector", "hash"],
    }

    def score(lang: str) -> str:
        terms = []
        for m in markers[lang]:
            esc = m.replace("'", "''")
            if spark:
                terms.append(
                    f"(size(split(lower(text), '{esc}')) - 1)"
                )
            else:
                terms.append(
                    f"(len(string_split(lower(text), '{esc}')) - 1)"
                )
        return " + ".join(terms)

    scores = ",\n           ".join(
        f"({score(lang)}) AS sc_{lang}" for lang in markers
    )
    langs = list(markers)
    greatest = ", ".join(f"sc_{lang}" for lang in langs)
    case = " ".join(
        f"WHEN GREATEST({greatest}) = sc_{lang} THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
           {scores}
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE {case} ELSE 'und' END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """


sql_query(
    "text_langid_heuristic",
    _langid_sql("spark"),
    oracle=_langid_sql("duck"),
    tags=("text", "langid"),
    doc="N-gram-marker language-ID heuristic (argmax of marker-substring "
    "counts, first-wins tie-break). Map-side only.",
)


def _token_count_sql(dialect: str) -> str:
    spark = dialect == "spark"
    if spark:
        ws = "size(split(text, ' +'))"
        bpe = "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
    else:
        ws = "len(string_split_regex(text, ' +'))"
        bpe = "len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"
    return f"""
    SELECT source,
           COUNT(*) AS n_docs,
           {isum(ws, 'ws_tokens')},
           {isum(bpe, 'bpe_ish_tokens')},
           {isum('length(text)', 'total_chars')}
    FROM documents
    GROUP BY source
    ORDER BY source
    """


sql_query(
    "text_token_counts",
    _token_count_sql("spark"),
    oracle=_token_count_sql("duck"),
    tags=("text", "tokens"),
    doc="Corpus token accounting per source: whitespace tokens and a BPE-ish "
    "regex token count (letter-runs / digit-runs / single symbols).",
)


def _fingerprint_sql(dialect: str) -> str:
    spark = dialect == "spark"
    shingles = _shingles(dialect)
    if spark:
        norm = "regexp_replace(lower(text), ' +', ' ')"
        winnow = "array_min(transform(shingles, s -> md5(s)))"
    else:
        norm = "regexp_replace(lower(text), ' +', ' ', 'g')"
        winnow = "list_min(list_transform(shingles, s -> md5(s)))"
    return f"""
    WITH sh AS (
      SELECT doc_id, md5({norm}) AS content_hash, {shingles} AS shingles
      FROM documents
    )
    SELECT doc_id, content_hash, {winnow} AS min_shingle_fp
    FROM sh
    ORDER BY doc_id
    """


sql_query(
    "text_fingerprint",
    _fingerprint_sql("spark"),
    oracle=_fingerprint_sql("duck"),
    tags=("text", "fingerprint"),
    doc="Document fingerprints: md5 of whitespace-normalized text plus a "
    "winnowing-style min-shingle-hash fingerprint.",
)


# ---------------------------------------------------------------------------
# event-time windows (batch form; streaming mirror in bdt_spark/streaming)
# ---------------------------------------------------------------------------

sql_query(
    "events_tumbling_window",
    f"""
    SELECT window.start AS win_start, event_type,
           COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM events
    WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    GROUP BY window(ts, '15 minutes'), event_type
    ORDER BY win_start, event_type
    """,
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS win_start, event_type,
           COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM events
    WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    tags=("events", "window", "tumbling"),
    doc="15-min tumbling event-time windows (batch form of the streaming "
    "windowed agg in bdt_spark/streaming).",
)

sql_query(
    "events_hopping_window",
    f"""
    SELECT window.start AS win_start,
           COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM events
    WHERE ts < TIMESTAMP '2024-01-01 08:00:00'
    GROUP BY window(ts, '30 minutes', '15 minutes')
    ORDER BY win_start
    """,
    oracle=f"""
    WITH hops AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS win_start, value
      FROM events WHERE ts < TIMESTAMP '2024-01-01 08:00:00'
      UNION ALL
      SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes', value
      FROM events WHERE ts < TIMESTAMP '2024-01-01 08:00:00'
    )
    SELECT win_start, COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM hops
    GROUP BY win_start
    ORDER BY win_start
    """,
    tags=("events", "window", "hopping"),
    doc="30-min windows hopping every 15 min; oracle expands each event "
    "into its two overlapping hops.",
)

sql_query(
    "events_session_window",
    f"""
    SELECT user_id, session_window.start AS sess_start,
           COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM events
    WHERE user_id < 10 AND ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY session_window(ts, '1 hour'), user_id
    ORDER BY user_id, sess_start
    """,
    oracle=f"""
    WITH marks AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL '1 hour'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WHERE user_id < 10 AND ts < TIMESTAMP '2024-01-08 00:00:00'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marks
    )
    SELECT user_id, MIN(ts) AS sess_start,
           COUNT(*) AS n_events, {dsum('value', 'total_value')}
    FROM sess
    GROUP BY user_id, sess_id
    ORDER BY user_id, sess_start
    """,
    tags=("events", "window", "session"),
    doc="1-hour-gap session windows per user (Spark session_window); oracle "
    "derives sessions with the gaps-and-islands pattern.",
)


# ---------------------------------------------------------------------------
# IVF similarity search: centroid training + cluster-pruned probe
# ---------------------------------------------------------------------------


def _centroids_cte(dialect: str) -> str:
    """Element-wise per-label centroids in relational (exploded) form.
    Decimal-exact sums keep the means bit-identical across engines."""
    if dialect == "spark":
        exploded = (
            "SELECT label, pos + 1 AS pos1, CAST(v AS DOUBLE) AS v\n"
            "      FROM embeddings LATERAL VIEW POSEXPLODE(embedding) t AS pos, v"
        )
    else:
        exploded = (
            "SELECT label, CAST(generate_subscripts(embedding, 1) AS INT) AS pos1,\n"
            "             CAST(unnest(embedding) AS DOUBLE) AS v\n"
            "      FROM embeddings"
        )
    return f"""centroids AS (
      SELECT label, pos1,
             CAST(SUM(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS c
      FROM ({exploded}) ex
      GROUP BY label, pos1
    )"""


sql_query(
    "similarity_ivf_centroids",
    f"""
    WITH {_centroids_cte('spark')}
    SELECT label, pos1, ROUND(c, 8) AS centroid
    FROM centroids
    ORDER BY label, pos1
    """,
    oracle=f"""
    WITH {_centroids_cte('duck')}
    SELECT label, pos1, ROUND(c, 8) AS centroid
    FROM centroids
    ORDER BY label, pos1
    """,
    tags=("similarity", "ivf", "centroids"),
    doc="IVF coarse-quantizer training step: element-wise per-cluster "
    "centroids via one explode + one (label, dim) partial-agg shuffle — "
    "the k-means-assignment-step shape that scales linearly.",
)


def _ivf_topk_sql(dialect: str) -> str:
    spark = dialect == "spark"
    if spark:
        q_exploded = (
            "SELECT vec_id AS q_id, pos + 1 AS pos1, CAST(v AS DOUBLE) AS qv\n"
            "      FROM embeddings LATERAL VIEW POSEXPLODE(embedding) t AS pos, v\n"
            "      WHERE vec_id < 10"
        )
    else:
        q_exploded = (
            "SELECT vec_id AS q_id,"
            " CAST(generate_subscripts(embedding, 1) AS INT) AS pos1,\n"
            "             CAST(unnest(embedding) AS DOUBLE) AS qv\n"
            "      FROM embeddings WHERE vec_id < 10"
        )
    cos = _cos_pre(dialect, "q.embedding", "c.embedding", "q.nrm", "c.nrm")
    # REPARTITION: see _cosine_neardup_sql — parallelize the probe scoring
    hint = "/*+ REPARTITION(32) */ " if dialect == "spark" else ""
    return f"""
    WITH {_centroids_cte(dialect)},
    v AS (
      SELECT {hint}vec_id, label, embedding,
             {_norm(dialect, "embedding")} AS nrm
      FROM embeddings
    ),
    q_exp AS (
      {q_exploded}
    ),
    assignment AS (
      SELECT q_id, label,
             ROW_NUMBER() OVER (
               PARTITION BY q_id
               ORDER BY ROUND(CAST(SUM(CAST((qv - c) * (qv - c)
                              AS DECIMAL(30,15))) AS DOUBLE), 8), label) AS rk
      FROM q_exp JOIN centroids ON q_exp.pos1 = centroids.pos1
      GROUP BY q_id, label
    ),
    probe AS (
      SELECT q_id, label FROM assignment WHERE rk = 1
    ),
    pairs AS (
      SELECT p.q_id, c.vec_id, {cos} AS cos_raw
      FROM probe p
      JOIN v q ON q.vec_id = p.q_id
      JOIN v c ON c.label = p.label AND c.vec_id <> p.q_id
    ),
    scored AS (
      SELECT q_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_raw DESC, vec_id) AS rk
      FROM pairs
    )
    SELECT q_id, vec_id, ROUND(cos_raw, 6) AS cos_sim, rk FROM scored
    WHERE rk <= 5
    ORDER BY q_id, rk
    """


sql_query(
    "similarity_topk_ivf",
    _ivf_topk_sql("spark"),
    oracle=_ivf_topk_sql("duck"),
    tags=("similarity", "ann", "ivf", "topk"),
    doc="IVF ANN search: assign each query to its nearest per-label "
    "centroid (decimal-exact L2), then exact cosine top-5 ONLY within that "
    "cluster. At scale the corpus is bucketed by cluster id, so each probe "
    "scans one bucket instead of the full corpus.",
)


@query(
    "similarity_ivf_recall_curve",
    oracle="""
    SELECT * FROM (VALUES (1, TRUE), (2, TRUE), (4, TRUE))
      AS t(nprobe, recall_ok)
    ORDER BY nprobe
    """,
    tags=("similarity", "ann", "ivf", "recall", "property"),
    doc=(
        "Measured recall@10 of the persistent IVF index (operators/ann.py) "
        "vs brute-force ground truth at nprobe in {1, 2, 4} with k=8 "
        "clusters, property-oracled: recall floors (0.15 / 0.35 / 0.60) are "
        "pinned well under the measured curve (~0.26 / ~0.46 / ~0.74 at "
        "sf0.01-sf0.1) so the boolean is deterministic with margin. Ground "
        "truth = ivf_probe at nprobe=k, which test_ann proves exact. The "
        "k-means build is fully deterministic (md5-seeded, no rand), so the "
        "curve is stable per fixture. This is the quality half of the "
        "ANN speed/recall trade the index exists for."
    ),
)
def similarity_ivf_recall_curve(spark, sf_dir):
    import shutil
    import tempfile

    from bdt_spark.operators.ann import build_ivf_index, ivf_probe
    from bdt_spark.operators.cacheutil import release

    emb = load_fixture_tables(spark, sf_dir)["embeddings"]
    path = tempfile.mkdtemp(prefix="bdt_ivf_recall_")
    try:
        build_ivf_index(spark, emb, path, k=8, n_iters=3)
        qs = emb.orderBy("vec_id").limit(20)  # deterministic query subset
        truth_raw = ivf_probe(spark, path, qs, topk=10, nprobe=8)
        truth = truth_raw.select("q_id", "vec_id").cache()
        denom = truth.count()
        release(truth_raw)  # truth rows are cached; drop the probe table
        floors = {1: 0.15, 2: 0.35, 4: 0.60}
        rows = []
        for nprobe, floor in floors.items():
            got = ivf_probe(spark, path, qs, topk=10, nprobe=nprobe)
            recall = (
                got.select("q_id", "vec_id")
                .join(truth, ["q_id", "vec_id"])
                .count()
                / denom
            )
            release(got)
            rows.append((nprobe, recall >= floor))
        truth.unpersist()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "nprobe int, recall_ok boolean"
    ).orderBy("nprobe")


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (quality filter -> exact dedup -> accounting)
# ---------------------------------------------------------------------------


def _curation_sql(dialect: str) -> str:
    spark = dialect == "spark"
    if spark:
        nwords = "size(split(text, ' '))"
        norm_hash = "md5(regexp_replace(lower(text), '[^a-z0-9 ]', ''))"
        ws_tokens = "size(split(text, ' +'))"
    else:
        nwords = "len(string_split(text, ' '))"
        norm_hash = "md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))"
        ws_tokens = "len(string_split_regex(text, ' +'))"
    return f"""
    WITH scored AS (
      SELECT doc_id, source, lang, text,
             length(text) AS n_chars_m,
             {nwords} AS n_words,
             {norm_hash} AS norm_hash
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_chars_m >= 50 AND n_words >= 10
        AND n_chars_m / CAST(n_words AS DOUBLE) BETWEEN 2.0 AND 12.0
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY norm_hash
                                     ORDER BY doc_id) AS copy_rank
        FROM quality) t
      WHERE copy_rank = 1
    )
    SELECT source,
           COUNT(*) AS docs_kept,
           CAST(SUM({ws_tokens}) AS BIGINT) AS tokens_kept,
           CAST(SUM(n_chars_m) AS BIGINT) AS chars_kept,
           COUNT(DISTINCT lang) AS langs_present
    FROM deduped
    GROUP BY source
    ORDER BY source
    """


sql_query(
    "pipeline_curation_end_to_end",
    _curation_sql("spark"),
    oracle=_curation_sql("duck"),
    tags=("pipeline", "curation", "dedup", "quality"),
    doc="The composed training-data curation pass: quality gate (length / "
    "word-count / word-length band) -> exact dedup on normalized text "
    "(first-writer-wins via ranking window) -> per-source token accounting. "
    "One scan, one window shuffle on the hash, one agg shuffle on source.",
)


# ---------------------------------------------------------------------------
# As-of join + time-range rolling windows (time-series operators)
# ---------------------------------------------------------------------------


@query(
    "events_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           s.ts AS login_ts, s.value AS login_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase'
            AND user_id < 20) p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
    tags=("events", "asof-join", "time-series"),
    doc="Point-in-time join (operators/asof.py): each purchase matched to "
    "the user's most recent signup at-or-before it. Oracle is DuckDB's "
    "native ASOF LEFT JOIN; Spark side is the union + carry-forward-window "
    "composition (one key shuffle + sort, no range explosion).",
)
def events_asof_join(spark, sf_dir):
    from bdt_spark.operators.asof import asof_join

    t = load_fixture_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 20)
    ).select("user_id", "ts", "event_id")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, signups, on="user_id", suffix="_s")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_s").alias("login_ts"),
        F.col("value_s").alias("login_value"),
    ).orderBy("event_id")


sql_query(
    "events_rolling_time_window",
    f"""
    SELECT user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           {'CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)'} AS sum_last_hour
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts
    """,
    tags=("events", "window", "time-series"),
    doc="Per-user rolling 1-hour aggregates via a time-RANGE window frame — "
    "partitioned by user so state stays bounded per key at any scale.",
)


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the LSH pair graph
# ---------------------------------------------------------------------------


def _cc_oracle_sql() -> str:
    """DuckDB oracle: recursive CTE propagating ids across the undirected
    pair graph; MIN over everything reachable = component id. (Spark has no
    recursive CTEs — its side is the iterative label-propagation loop.)"""
    pair_sql = _minhash_lsh_sql("duck")
    return f"""
    WITH RECURSIVE pairs AS (
      {pair_sql}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(node, seen) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.seen FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT MIN(seen) AS cluster_id, node AS doc_id
    FROM reach
    GROUP BY node
    ORDER BY cluster_id, doc_id
    """


def _semantic_cc_oracle_sql() -> str:
    """Same recursive-CTE component oracle over the COSINE pair graph."""
    pair_sql = _cosine_neardup_sql("duck")
    return f"""
    WITH RECURSIVE pairs AS (
      {pair_sql}
    ),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM pairs
      UNION ALL
      SELECT vec_b AS src, vec_a AS dst FROM pairs
    ),
    reach(node, seen) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.seen FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT MIN(seen) AS cluster_id, node AS vec_id
    FROM reach
    GROUP BY node
    ORDER BY cluster_id, vec_id
    """


@query(
    "dedup_semantic_clusters",
    oracle=_semantic_cc_oracle_sql(),
    tags=("dedup", "embedding", "graph", "iterative"),
    doc="SEMANTIC near-dup clusters: connected components over the "
    "sign-LSH-bucketed cosine>=0.9 pair graph — the embedding-space "
    "counterpart of dedup_connected_components, reusing the same "
    "operators/graph.py loop on a different edge source (the operator "
    "composes over any pair list). The edge source's spanning-window "
    "candidate generation keeps edges LINEAR in corpus size while "
    "spanning every bucket-coherent near-dup group, so the component "
    "assignment equals the exhaustive-pair answer on replica cliques at "
    "a fraction of the edges. Oracle = DuckDB recursive CTE.",
)
def dedup_semantic_clusters(spark, sf_dir):
    from bdt_spark.operators.cacheutil import (
        drop_checkpoint_blocks,
        release,
        transfer_ownership,
    )
    from bdt_spark.operators.graph import connected_components

    src_pairs = dedup_embedding_cosine(spark, sf_dir)
    pairs = src_pairs.select("vec_a", "vec_b")
    # Truncate lineage at the operator boundary: the pair output is
    # already persisted AND materialized, but its logical plan still
    # carries the 48 unrolled plane-bucket expression trees + the 64-term
    # cosine chain. The iterative loop below re-embeds that subtree in
    # every per-iteration plan; at sf10 (~15-30 iterations) the resulting
    # EXPLAIN string grows to gigabytes and OOMs the driver inside
    # QueryExecution.explainString (event-listener plan rendering).
    # localCheckpoint replaces the whole subtree with an RDD-scan leaf —
    # cheap here because the rows are already computed and cached.
    pairs = pairs.localCheckpoint(eager=True)
    # the checkpoint holds its own copy of the rows: drop the operator's
    # persisted cache so the session doesn't carry both (2M rows at sf10)
    release(src_pairs)
    # max_iters: convergence needs <= graph diameter rounds. The 16*k
    # rungs give a 16-member in-clique jump under ANY k-way interleave up
    # to the window size, so diameter ~ members/16 (+ a window tail):
    # 64 covers cliques to ~900 members at <= 8-way interleave. The two
    # overrun modes differ: a >900-member clique exceeds the diameter
    # budget and the CC loop FAILS LOUDLY (max_iters); a >8-way
    # round-robin interleave yields rank distances sharing no rung, so
    # those cliques get ZERO in-bucket candidate edges and recall
    # degrades SILENTLY (the docs appear as singletons — undetectable at
    # runtime without ground truth, and the DuckDB oracle shares the
    # geometry so the hash-compare cannot catch it either). The recall
    # floor against >8-way interleaves is pinned instead by
    # tests/test_dedup_ops.py::test_rungs_cover_every_interleave_factor
    # geometry checks; corpora expected to pack more than 8 near-dup
    # cliques per LSH bucket should raise NEARDUP_WINDOW.
    cc = connected_components(pairs, "vec_a", "vec_b", max_iters=64)
    out = cc.select("cluster_id", F.col("node").alias("vec_id")).orderBy(
        "cluster_id", "vec_id"
    )
    # caller-owned: the CC label cache/checkpoints (annotated on cc) plus
    # the pair checkpoint above, which stays in the result's recompute
    # lineage — cacheutil.release(result) frees everything at end of life
    return transfer_ownership(
        out, cc, lambda: drop_checkpoint_blocks(pairs)
    )


sql_query(
    "sample_global_shuffle",
    """
    SELECT doc_id, lang,
           md5(concat('epoch7#', CAST(doc_id AS STRING))) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
    oracle="""
    SELECT doc_id, lang,
           md5('epoch7#' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
    tags=("sampling", "shuffle", "pipeline"),
    doc="Deterministic global training-order shuffle: sort by "
    "md5(epoch_seed # doc_id). Reproducible on any engine/cluster/retry "
    "(rand() is not), reshuffled per epoch by changing the seed; at scale "
    "this is a single range-partitioned sort producing shard files in "
    "epoch order.",
)


@query(
    "dedup_connected_components",
    oracle=_cc_oracle_sql(),
    tags=("dedup", "graph", "iterative"),
    doc="Near-dup CLUSTERS (not just pairs): iterative min-label "
    "propagation over the MinHash-LSH pair graph until fixpoint — the "
    "connected-components step a production dedup pipeline runs to pick "
    "one survivor per duplicate group. Each iteration is one distributed "
    "join + min-aggregate; iterations are bounded by the graph diameter "
    "(dup clusters are tiny, so 2-4 in practice). Oracle uses DuckDB's "
    "recursive CTE, which Spark lacks.",
)
def dedup_connected_components(spark, sf_dir):
    # loop lives in operators/graph.py (periodic lineage checkpointing,
    # reusable on any pair list); this query pins it to the oracle
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.graph import connected_components

    src = dedup_minhash_lsh(spark, sf_dir)
    cc = connected_components(
        src.select("doc_a", "doc_b"), "doc_a", "doc_b"
    )
    out = cc.select("cluster_id", F.col("node").alias("doc_id")).orderBy(
        "cluster_id", "doc_id"
    )
    # caller-owned: the CC label cache (annotated on cc) plus the pair
    # source, which may itself be persisted on minhash's eager path
    return transfer_ownership(out, cc, src)


# ---------------------------------------------------------------------------
# Deterministic sampling / splitting (pipeline staple: stable across runs,
# engines, and cluster sizes — unlike TABLESAMPLE/rand())
# ---------------------------------------------------------------------------

sql_query(
    "sample_deterministic_hash",
    """
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CASE
               WHEN CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
                    % 100 < 80 THEN 'train'
               WHEN CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 4), 16, 10)
                    % 100 < 90 THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents) t
    GROUP BY split
    ORDER BY split
    """,
    oracle="""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT n_chars,
             CASE
               WHEN CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                         AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                         AS BIGINT) % 100 < 90 THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents) t
    GROUP BY split
    ORDER BY split
    """,
    tags=("sampling", "split", "pipeline"),
    doc="Deterministic 80/10/10 train/valid/test split via md5-bucket "
    "hashing of the stable key — reproducible on any engine, any cluster "
    "size, any run (TABLESAMPLE/rand() are not). Map-side only.",
)


# ---------------------------------------------------------------------------
# round-2 pipeline depth: stratified sampling, PII redaction, top-k terms,
# sequence packing, embedding centroids
# ---------------------------------------------------------------------------


def _stratified_sql(dialect: str) -> str:
    key = (
        "md5(CAST(c_custkey AS STRING))"
        if dialect == "spark"
        else "md5(CAST(c_custkey AS VARCHAR))"
    )
    return f"""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY {key}) AS rk
      FROM customer
    )
    SELECT c_mktsegment, rk, c_custkey
    FROM ranked WHERE rk <= 20
    ORDER BY c_mktsegment, rk
    """


sql_query(
    "sample_stratified_exact",
    _stratified_sql("spark"),
    oracle=_stratified_sql("duck"),
    tags=("sampling", "stratified"),
    doc="Exact-count stratified sample: 20 rows per class, selected by "
    "md5-hash order — deterministic on any cluster/partitioning, no "
    "driver-side randomness. At 100 TB: one window shuffle on the strata "
    "key; for heavy strata swap row_number for a per-stratum hash "
    "threshold (no sort) at the cost of approximate counts.",
)


def _pii_sql(dialect: str) -> str:
    spark = dialect == "spark"
    synth = (
        "concat(text, ' contact user', CAST(doc_id AS STRING),"
        " '@example.com or +1-555-01', CAST(doc_id % 90 + 10 AS STRING))"
        if spark
        else "concat(text, ' contact user', CAST(doc_id AS VARCHAR),"
        " '@example.com or +1-555-01', CAST(doc_id % 90 + 10 AS VARCHAR))"
    )
    # character classes only — no backslashes, since Spark SQL string
    # literals process backslash escapes but DuckDB literals do not
    email = "[a-z0-9]+@[a-z]+[.][a-z]+"
    phone = "[+]?[0-9][0-9-]{7,}"
    if spark:
        redact = (
            f"regexp_replace(regexp_replace(raw, '{email}', '<EMAIL>'),"
            f" '{phone}', '<PHONE>')"
        )
        n_email = f"size(regexp_extract_all(raw, '{email}', 0))"
        n_phone = f"size(regexp_extract_all(raw, '{phone}', 0))"
    else:
        redact = (
            f"regexp_replace(regexp_replace(raw, '{email}', '<EMAIL>', 'g'),"
            f" '{phone}', '<PHONE>', 'g')"
        )
        n_email = f"len(regexp_extract_all(raw, '{email}'))"
        n_phone = f"len(regexp_extract_all(raw, '{phone}'))"
    return f"""
    WITH synth AS (
      SELECT doc_id, {synth} AS raw FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST({n_email} AS INT) AS n_emails,
           CAST({n_phone} AS INT) AS n_phones,
           md5({redact}) AS redacted_md5
    FROM synth
    ORDER BY doc_id
    """


sql_query(
    "text_pii_redaction",
    _pii_sql("spark"),
    oracle=_pii_sql("duck"),
    tags=("text", "pii", "redaction"),
    doc="PII scrubbing pass: email + phone regex redaction with match "
    "counts (fixture text is digit-free, so deterministic doc_id-derived "
    "contact strings are appended first). Pure regexp_replace — "
    "whole-stage codegen, no UDF.",
)


def _lang_temperature_sql(dialect: str) -> str:
    """Temperature-based language rebalancing (the mC4/XLM-R scheme):
    sampling weight per lang = count^alpha / sum(count^alpha), alpha<1
    upweights low-resource languages. Allocation uses largest-remainder
    rounding so the per-lang quotas sum exactly to the budget; the docs
    actually taken are the md5-smallest per lang — deterministic on any
    engine and any partitioning."""
    alpha = 0.5
    budget = 1000
    md5_id = (
        "md5(CAST(doc_id AS STRING))"
        if dialect == "spark"
        else "md5(CAST(doc_id AS VARCHAR))"
    )
    return f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    weights AS (
      SELECT lang, n_docs,
             POWER(n_docs, {alpha})
               / SUM(POWER(n_docs, {alpha})) OVER () AS w
      FROM counts
    ),
    quota AS (
      SELECT lang, n_docs, w,
             CAST(FLOOR(w * {budget}) AS BIGINT) AS base_take,
             ROW_NUMBER() OVER (
               ORDER BY w * {budget} - FLOOR(w * {budget}) DESC, lang
             ) AS frac_rank
      FROM weights
    ),
    alloc AS (
      SELECT lang, n_docs, w,
             base_take + CASE WHEN frac_rank <=
               {budget} - (SELECT SUM(base_take) FROM quota)
               THEN 1 ELSE 0 END AS take_n
      FROM quota
    ),
    ranked AS (
      SELECT d.lang, d.doc_id,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY {md5_id}, d.doc_id) AS rk
      FROM documents d
    )
    SELECT a.lang, a.n_docs, ROUND(a.w, 6) AS weight,
           CAST(a.take_n AS BIGINT) AS take_n,
           CAST(COUNT(r.doc_id) AS BIGINT) AS taken,
           MIN(r.doc_id) AS first_doc
    FROM alloc a
    JOIN ranked r ON r.lang = a.lang AND r.rk <= a.take_n
    GROUP BY a.lang, a.n_docs, a.w, a.take_n
    ORDER BY a.lang
    """


sql_query(
    "sample_language_temperature",
    _lang_temperature_sql("spark"),
    oracle=_lang_temperature_sql("duck"),
    tags=("sampling", "mixing", "pipeline"),
    doc="Temperature-resampled language mix (mC4/XLM-R): per-lang weight "
    "count^0.5 normalized, largest-remainder rounding to hit the budget "
    "exactly, md5-order deterministic selection within each language. "
    "Two tiny aggs over lang cardinality + one ranking window per lang — "
    "the doc scan is one pass; the allocation table is driver-size at any "
    "corpus scale.",
)


def _topk_terms_sql(dialect: str) -> str:
    words = _word_stream(dialect)
    return f"""
    WITH w AS (
      SELECT lang, {words} AS word FROM documents
    ),
    c AS (
      SELECT lang, word, COUNT(*) AS n
      FROM w WHERE length(word) >= 3
      GROUP BY lang, word
    ),
    r AS (
      SELECT lang, word, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, word) AS rk
      FROM c
    )
    SELECT lang, rk, word, n FROM r WHERE rk <= 5
    ORDER BY lang, rk
    """


sql_query(
    "text_topk_terms_per_lang",
    _topk_terms_sql("spark"),
    oracle=_topk_terms_sql("duck"),
    tags=("text", "topk", "terms"),
    doc="Top-5 terms per language: explode -> two-level partial-agg "
    "shuffle on (lang, word) -> per-lang ranking window. The explode is "
    "map-side; the (lang, word) agg bounds the ranking input to distinct "
    "terms, so the window state stays tiny at any corpus size.",
)


PACK_BUDGET = 2048


def _first_fit_pack(pdf):
    """Stream-order (doc_id) first-fit pack ids. ONE implementation for
    both packing queries — their DuckDB recursive-CTE oracles and the
    independent tools/verify_packing.py checker all assume identical
    pack semantics, so a drift between two copies would break the gate
    subtly, not loudly."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pack_ids, fill, pid = [], 0, 0
    for tk in pdf["tokens"]:
        if fill > 0 and fill + tk > PACK_BUDGET:
            pid, fill = pid + 1, int(tk)
        else:
            fill += int(tk)
        pack_ids.append(pid)
    pdf["pack_id"] = pack_ids
    return pdf


def _packing_oracle_sql() -> str:
    # Greedy consecutive packing per lang via DuckDB recursive CTE: the
    # working table carries (pack_id, fill) row to row in doc_id order.
    return f"""
    WITH RECURSIVE toks AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS tokens,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, tokens, rn, 0 AS pack_id, tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.lang, t.doc_id, t.tokens, t.rn,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN t.tokens ELSE p.fill + t.tokens END
      FROM toks t JOIN packed p ON t.lang = p.lang AND t.rn = p.rn + 1
    )
    SELECT lang, pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """


@query(
    "tokens_sequence_packing",
    oracle=_packing_oracle_sql(),
    tags=("tokens", "packing", "applyInPandas"),
    doc=f"Greedy sequence packing for training batches: docs in doc_id "
    f"order are packed into <= {PACK_BUDGET}-token bins per lang "
    "(oversized docs get their own bin). Inherently sequential per "
    "stream, so each lang's stream is packed in one applyInPandas group "
    "— at 100 TB the stream key is (shard, lang) so groups stay "
    "worker-sized while packing remains exact within each shard. Oracle "
    "is a DuckDB recursive CTE with identical greedy semantics.",
)
def tokens_sequence_packing(spark, sf_dir):
    import pandas as pd

    t = load_fixture_tables(spark, sf_dir)
    toks = t["documents"].selectExpr(
        "lang", "doc_id", "CAST(size(split(text, ' ')) AS INT) AS tokens"
    )

    packed = toks.groupBy("lang").applyInPandas(
        _first_fit_pack, "lang string, doc_id long, tokens int, pack_id int"
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "pack_id")
    )


def _packing_efficiency_oracle_sql() -> str:
    # greedy side exactly reproduced by the same recursive CTE as
    # tokens_sequence_packing; the BFD side is property-pinned (TRUE
    # literals), since best-fit's bin assignment is not SQL-expressible
    return f"""
    WITH RECURSIVE toks AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS tokens,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, tokens, rn, 0 AS pack_id, tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.lang, t.doc_id, t.tokens, t.rn,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN t.tokens ELSE p.fill + t.tokens END
      FROM toks t JOIN packed p ON t.lang = p.lang AND t.rn = p.rn + 1
    ),
    bins AS (
      SELECT lang, pack_id, SUM(tokens) AS bin_tokens
      FROM packed GROUP BY lang, pack_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS greedy_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           ROUND(1.0 - SUM(bin_tokens)
                 / CAST(SUM(GREATEST({PACK_BUDGET}, bin_tokens)) AS DOUBLE),
                 6) AS greedy_waste_pct,
           TRUE AS bfd_no_worse,
           TRUE AS bfd_lower_bound_ok
    FROM bins GROUP BY lang ORDER BY lang
    """


@query(
    "tokens_packing_efficiency",
    oracle=_packing_efficiency_oracle_sql(),
    tags=("tokens", "packing", "efficiency", "applyInPandas"),
    doc=(
        "Packing-efficiency accounting: per lang, the greedy (doc_id-order "
        "first-fit) packer's bin count and padding-waste fraction — waste "
        "= 1 - tokens/capacity, where an oversized doc's bin counts at its "
        "own size — plus a best-fit-decreasing repack of the same stream. "
        "Greedy numbers are exactly oracled (same recursive CTE as "
        "tokens_sequence_packing); BFD is property-pinned: never more bins "
        "than greedy on the fixtures, never below the ceil(total/budget) "
        "lower bound (theoretical). Measured at sf0.1: BFD cuts waste "
        "2.6x — 3.52% -> 1.36% padding (see SCALE.md). Greedy stays the "
        "default packer because it "
        "preserves doc order (deterministic curriculum); BFD is the "
        "throughput option when order within a shard is free."
    ),
)
def tokens_packing_efficiency(spark, sf_dir):
    import bisect

    import pandas as pd

    t = load_fixture_tables(spark, sf_dir)
    toks = t["documents"].selectExpr(
        "lang", "doc_id", "CAST(size(split(text, ' ')) AS INT) AS tokens"
    )

    def eff(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        sizes = [int(x) for x in pdf["tokens"]]
        # greedy first-fit in stream order (identical to the packer)
        fills = []
        for tk in sizes:
            if fills and fills[-1] + tk <= PACK_BUDGET:
                fills[-1] += tk
            else:
                fills.append(tk)
        # best-fit decreasing: place each doc (largest first) into the
        # FULLEST bin it still fits; bins kept sorted by fill for bisect
        bfd = []
        for tk in sorted(sizes, reverse=True):
            i = bisect.bisect_right(bfd, PACK_BUDGET - tk) - 1
            if i >= 0:
                fill = bfd.pop(i) + tk
                bisect.insort(bfd, fill)
            else:
                bisect.insort(bfd, tk)
        cap = sum(max(PACK_BUDGET, f) for f in fills)
        bfd_cap = sum(max(PACK_BUDGET, f) for f in bfd)
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "greedy_bins": [len(fills)],
                "total_tokens": [sum(sizes)],
                "greedy_capacity": [cap],
                "bfd_bins": [len(bfd)],
                "bfd_capacity": [bfd_cap],
            }
        )

    stats = toks.groupBy("lang").applyInPandas(
        eff,
        "lang string, greedy_bins long, total_tokens long,"
        " greedy_capacity long, bfd_bins long, bfd_capacity long",
    )
    return stats.select(
        "lang",
        "greedy_bins",
        "total_tokens",
        F.round(
            1.0 - F.col("total_tokens") / F.col("greedy_capacity").cast("double"),
            6,
        ).alias("greedy_waste_pct"),
        (F.col("bfd_bins") <= F.col("greedy_bins")).alias("bfd_no_worse"),
        (
            F.col("bfd_bins")
            >= F.ceil(F.col("total_tokens") / F.lit(float(PACK_BUDGET)))
        ).alias("bfd_lower_bound_ok"),
    ).orderBy("lang")


def _centroid_sql(dialect: str) -> str:
    spark = dialect == "spark"
    nrm = _norm(dialect, "embedding")
    if spark:
        return f"""
        WITH nn AS (
          SELECT label, embedding, {nrm} AS nrm FROM embeddings
        ),
        ex AS (
          SELECT label, pos + 1 AS i, CAST(x AS DOUBLE) / nrm AS xn
          FROM nn LATERAL VIEW posexplode(embedding) AS pos, x
          WHERE pos < 4
        )
        SELECT label, i,
               ROUND(CAST(SUM(CAST(xn AS DECIMAL(30,12))) AS DOUBLE)
                     / COUNT(*), 6) AS centroid,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM ex GROUP BY label, i
        ORDER BY label, i
        """
    return f"""
    WITH nn AS (
      SELECT label, embedding, {nrm} AS nrm FROM embeddings
    ),
    ex AS (
      SELECT label, CAST(i AS INT) AS i,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) / nrm AS xn
      FROM nn, range(1, 5) AS t(i)
    )
    SELECT label, i,
           ROUND(CAST(SUM(CAST(xn AS DECIMAL(30,12))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM ex GROUP BY label, i
    ORDER BY label, i
    """


sql_query(
    "embedding_normalize_centroid",
    _centroid_sql("spark"),
    oracle=_centroid_sql("duck"),
    tags=("embedding", "centroid", "normalize"),
    doc="L2-normalize embeddings then per-label centroid (first 4 dims "
    "shown): norm is a sequential double fold per vector (deterministic), "
    "the per-(label, dim) mean uses the decimal-sum recipe so accumulation "
    "order is moot. Shape at scale: one narrow shuffle on (label, dim) "
    "after a map-side partial agg.",
)


def _outlier_clip_sql(dialect: str) -> str:
    pctl = "percentile" if dialect == "spark" else "quantile_cont"
    return f"""
    WITH bounds AS (
      SELECT lang,
             {pctl}(n_chars, 0.05) AS p05,
             {pctl}(n_chars, 0.95) AS p95
      FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN n_chars < p05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN n_chars > p95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           ROUND(p05, 6) AS p05, ROUND(p95, 6) AS p95
    FROM documents d JOIN bounds b ON d.lang = b.lang
    GROUP BY d.lang, p05, p95
    ORDER BY d.lang
    """


sql_query(
    "text_outlier_clipping",
    _outlier_clip_sql("spark"),
    oracle=_outlier_clip_sql("duck"),
    tags=("text", "quality", "percentile"),
    doc="Percentile-based length clipping: exact interpolated p05/p95 per "
    "lang (Spark percentile == DuckDB quantile_cont, bit-identical), "
    "then per-lang outlier counts. The bounds side is tiny (one row per "
    "lang) and broadcasts; at 100 TB swap exact percentile for "
    "approx_percentile and accept the documented sketch divergence.",
)


sql_query(
    "scalar_nondeterministic_bounds",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           bool_and(u RLIKE
             '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$'
           ) AS uuid_v4_ok,
           bool_and(r >= 0 AND r < 1) AS rand_in_unit,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS uuid_distinct
    FROM (SELECT uuid() AS u, rand() AS r FROM range(1000))
    """,
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           bool_and(regexp_matches(CAST(u AS VARCHAR),
             '^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$'
           )) AS uuid_v4_ok,
           bool_and(r >= 0 AND r < 1) AS rand_in_unit,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS uuid_distinct
    FROM (SELECT uuid() AS u, random() AS r FROM range(1000))
    """,
    tags=("scalar", "nondeterministic"),
    doc="uuid()/rand() (B8) oracled by PROPERTY, not value: v4-format "
    "regex, uniqueness, and unit-interval bounds reduce to deterministic "
    "booleans both engines agree on. (Raw values are nondeterministic by "
    "definition; Spark requires them projected in a subquery before "
    "aggregating.)",
)


def _repetition_sql(dialect: str) -> str:
    words = _word_stream(dialect)
    return f"""
    WITH w AS (
      SELECT doc_id, {words} AS word FROM documents
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS n
      FROM w GROUP BY doc_id, word
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS total_words,
             CAST(COUNT(*) AS BIGINT) AS distinct_words,
             CAST(MAX(n) AS BIGINT) AS top_word_count
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, total_words, distinct_words,
           ROUND(CAST(top_word_count AS DOUBLE) / total_words, 6)
             AS top_word_ratio,
           ROUND(CAST(distinct_words AS DOUBLE) / total_words, 6)
             AS distinct_ratio,
           CAST(top_word_count AS DOUBLE) / total_words > 0.10
             AS is_repetitive
    FROM per_doc
    ORDER BY doc_id
    """


sql_query(
    "text_repetition_filter",
    _repetition_sql("spark"),
    oracle=_repetition_sql("duck"),
    tags=("text", "quality", "repetition"),
    doc="C4-style repetition filter: per-doc top-term frequency ratio and "
    "type-token ratio flag boilerplate/spam docs. Two partial-agg "
    "shuffles — (doc, word) then doc — both map-side combinable; no "
    "window over raw words.",
)


def _decontam_sql(dialect: str) -> str:
    shingles = _shingles(dialect)
    expl = _shingle_stream(dialect)
    return f"""
    WITH ex AS (
      SELECT doc_id, {expl} AS shingle
      FROM (SELECT doc_id, {shingles} AS shingles FROM documents)
    ),
    bench AS (
      SELECT DISTINCT shingle FROM ex WHERE doc_id < 10
    ),
    hits AS (
      SELECT c.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_contaminated_shingles
      FROM ex c JOIN bench b ON c.shingle = b.shingle
      WHERE c.doc_id >= 10
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_contaminated_shingles
    FROM hits
    WHERE n_contaminated_shingles >= 5
    ORDER BY doc_id
    """


sql_query(
    "text_benchmark_decontamination",
    _decontam_sql("spark"),
    oracle=_decontam_sql("duck"),
    tags=("text", "decontamination", "ngram"),
    doc="Benchmark decontamination: flag corpus docs sharing >= 5 word-3-"
    "shingles with a held-out set (docs 0-9 stand in for an eval "
    "benchmark). The benchmark shingle set is tiny and broadcasts; the "
    "corpus side is one explode + equi join + per-doc agg — never "
    "pairwise doc x doc.",
)


def _substring_contam_sql(dialect: str) -> str:
    pos = (
        "INSTR(c.text, b.snippet) > 0"
        if dialect == "spark"
        else "position(b.snippet IN c.text) > 0"
    )
    # Only one organic corpus doc contains a verbatim bench snippet at
    # sf0.01 — a 1-row result barely exercises the contains-join. The
    # contam CTE plants each snippet inside a synthetic carrier doc so the
    # query provably flags every contaminated doc (>= 10 rows at any sf)
    # on top of the organic hit.
    return f"""
    WITH bench AS (
      SELECT doc_id AS bench_id, SUBSTRING(text, 10, 40) AS snippet
      FROM documents WHERE doc_id < 10 AND LENGTH(text) >= 50
    ),
    contam AS (
      SELECT bench_id + 1000000 AS doc_id,
             'leaked eval text: ' || snippet || ' (end of leak)' AS text
      FROM bench
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 10
      UNION ALL
      SELECT doc_id, text FROM contam
    ),
    flagged AS (
      SELECT c.doc_id, b.bench_id
      FROM corpus c JOIN bench b ON {pos}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_benchmarks_hit,
           MIN(bench_id) AS first_bench
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """


sql_query(
    "text_substring_contamination",
    _substring_contam_sql("spark"),
    oracle=_substring_contam_sql("duck"),
    tags=("text", "decontamination", "substring"),
    doc="Exact-substring contamination (the other standard decontamination "
    "mode next to n-gram overlap): corpus docs containing a 40-char "
    "verbatim snippet of any held-out doc. The snippet table is tiny and "
    "broadcasts; the corpus side is one scan with a contains() predicate "
    "per snippet — at real benchmark sizes this becomes an Aho-Corasick "
    "pass inside mapInPandas, same join shape.",
)


def _dup_span_sql(dialect: str) -> str:
    shingles = _shingles(dialect)
    expl = _shingle_stream(dialect)
    return f"""
    WITH grams AS (
      SELECT doc_id, {expl} AS s
      FROM (SELECT doc_id, {shingles} AS shingles FROM documents)
    ),
    freq AS (
      SELECT s, COUNT(*) AS n_docs FROM grams GROUP BY s
    ),
    per_doc AS (
      -- the report covers doc_id < 500 ONLY, so the filter lives on the
      -- probe branch (pushed below the explode into the scan) instead of
      -- on the aggregated output: freq must still span the WHOLE corpus
      -- ("shared with ANY doc"), but the join's probe side and the
      -- per-doc aggregate shrink from all shingles to the reported docs'
      -- (~1000x fewer rows at sf10). Identical result — the filter is on
      -- the group key.
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_spans
      FROM grams g JOIN freq f ON g.s = f.s
      WHERE g.doc_id < 500
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_spans, n_shared_spans,
           ROUND(CAST(n_shared_spans AS DOUBLE) / n_spans, 6)
             AS shared_span_ratio
    FROM per_doc
    ORDER BY doc_id
    """


sql_query(
    "text_duplicate_span_ratio",
    _dup_span_sql("spark"),
    oracle=_dup_span_sql("duck"),
    tags=("text", "dedup", "spans"),
    doc="Corpus-level span-sharing signal (C4 span-dedup precursor): for "
    "each doc, the fraction of its word-3-shingles appearing in any other "
    "doc. Shingles are per-doc distinct, so COUNT(*) per shingle counts "
    "docs; one (shingle) agg shuffle + one join back — linear in corpus "
    "shingle volume, never doc x doc.",
)


sql_query(
    "events_sessionize_gaps_islands",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id < 40
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           ROUND(SUM(value), 6) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id < 40
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           ROUND(SUM(value), 6) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("events", "sessionization", "window"),
    doc="Gaps-and-islands sessionization (30-min inactivity): lag-compare "
    "-> running-sum session ids -> per-session stats. The window-chain "
    "alternative to session_window; one shuffle on user_id serves both "
    "windows and the final agg.",
)


def _survivors_oracle_sql() -> str:
    """Deduped corpus: drop every clustered doc except its cluster's MIN."""
    cc = _cc_oracle_sql()
    return f"""
    WITH clusters AS (
      {cc.replace("ORDER BY cluster_id, doc_id", "")}
    ),
    losers AS (
      SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d
    LEFT JOIN losers l ON d.doc_id = l.doc_id
    WHERE l.doc_id IS NULL AND d.doc_id < 120
    ORDER BY d.doc_id
    """


@query(
    "dedup_survivors_corpus",
    oracle=_survivors_oracle_sql(),
    tags=("dedup", "survivors", "end-to-end"),
    doc="The dedup END PRODUCT: the corpus with every near-dup cluster "
    "reduced to its MIN-doc_id survivor. Composes MinHash-LSH pairs -> "
    "connected components -> anti join of non-survivors against the "
    "corpus (broadcast: the loser set is tiny relative to the corpus). "
    "This is the table a training run actually reads.",
)
def dedup_survivors_corpus(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership

    clusters = dedup_connected_components(spark, sf_dir)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    t = load_fixture_tables(spark, sf_dir)
    out = (
        t["documents"]
        .join(F.broadcast(losers), "doc_id", "left_anti")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )
    return transfer_ownership(out, clusters)


def _curation_v2_sql(dialect: str) -> str:
    """Round-2 curation: repetition filter + decontamination + per-lang
    packing stats on top of the v1 quality/dedup gates."""
    spark = dialect == "spark"
    shingles = _shingles(dialect)
    expl = _shingle_stream(dialect)
    words = _word_stream(dialect)
    if spark:
        ws_tokens = "size(split(text, ' '))"
    else:
        ws_tokens = "len(string_split(text, ' '))"
    return f"""
    WITH rep AS (
      SELECT doc_id,
             CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_ratio
      FROM (
        SELECT doc_id, word, COUNT(*) AS n
        FROM (SELECT doc_id, {words} AS word FROM documents) w
        GROUP BY doc_id, word
      ) wc
      GROUP BY doc_id
    ),
    ex AS (
      SELECT doc_id, {expl} AS shingle
      FROM (SELECT doc_id, {shingles} AS shingles FROM documents)
    ),
    kept AS (
      SELECT d.doc_id, d.lang, {ws_tokens} AS tokens
      FROM documents d
      JOIN rep r ON d.doc_id = r.doc_id
      LEFT JOIN (SELECT doc_id, COUNT(*) AS n_hits
                 FROM (SELECT c.doc_id FROM ex c
                       JOIN (SELECT DISTINCT shingle FROM ex
                             WHERE doc_id < 10) b
                         ON c.shingle = b.shingle
                       WHERE c.doc_id >= 10) h
                 GROUP BY doc_id) cont ON d.doc_id = cont.doc_id
      WHERE d.doc_id >= 10
        AND r.top_ratio <= 0.10
        AND COALESCE(cont.n_hits, 0) < 5
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(tokens) AS BIGINT) AS tokens_kept,
           CAST(CEIL(SUM(tokens) / 2048.0) AS BIGINT) AS min_packs_needed
    FROM kept
    GROUP BY lang
    ORDER BY lang
    """


sql_query(
    "pipeline_curation_v2",
    _curation_v2_sql("spark"),
    oracle=_curation_v2_sql("duck"),
    tags=("pipeline", "curation", "repetition", "decontamination"),
    doc="Round-2 curation composition: repetition gate (top-term ratio "
    "<= 0.10) + benchmark decontamination (< 5 shared shingles with the "
    "held-out set) -> per-lang token accounting with a lower bound on "
    "2048-token packs. One shingle pass feeds both the contamination "
    "join and (via word counts) the repetition gate.",
)


N_PACK_SHARDS = 4


def _packing_sharded_oracle_sql() -> str:
    return f"""
    WITH RECURSIVE toks AS (
      SELECT lang, CAST(doc_id % {N_PACK_SHARDS} AS INT) AS shard, doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS tokens,
             ROW_NUMBER() OVER (PARTITION BY lang, doc_id % {N_PACK_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT lang, shard, doc_id, tokens, rn, 0 AS pack_id, tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.lang, t.shard, t.doc_id, t.tokens, t.rn,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + t.tokens > {PACK_BUDGET}
                  THEN t.tokens ELSE p.fill + t.tokens END
      FROM toks t
      JOIN packed p ON t.lang = p.lang AND t.shard = p.shard
                   AND t.rn = p.rn + 1
    )
    SELECT lang, shard, CAST(pack_id AS INT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, shard, pack_id
    ORDER BY lang, shard, pack_id
    """


@query(
    "tokens_sequence_packing_sharded",
    oracle=_packing_sharded_oracle_sql(),
    tags=("tokens", "packing", "sharded", "applyInPandas"),
    doc=f"The 100 TB packing shape: stream key = (lang, shard) where "
    f"shard = doc_id % {N_PACK_SHARDS}, so each applyInPandas group is "
    "worker-sized regardless of corpus size (packing is exact within a "
    "shard; global optimality is deliberately traded for bounded group "
    "memory). Same greedy semantics as tokens_sequence_packing, oracled "
    "per (lang, shard) via the recursive CTE.",
)
def tokens_sequence_packing_sharded(spark, sf_dir):
    import pandas as pd

    t = load_fixture_tables(spark, sf_dir)
    toks = t["documents"].selectExpr(
        "lang",
        f"CAST(doc_id % {N_PACK_SHARDS} AS INT) AS shard",
        "doc_id",
        "CAST(size(split(text, ' ')) AS INT) AS tokens",
    )

    packed = toks.groupBy("lang", "shard").applyInPandas(
        _first_fit_pack,
        "lang string, shard int, doc_id long, tokens int, pack_id int",
    )
    return (
        packed.groupBy("lang", "shard", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tokens").cast("long").alias("pack_tokens"),
        )
        .orderBy("lang", "shard", "pack_id")
    )


def _unigram_logprob_sql(dialect: str) -> str:
    words = _word_stream(dialect)
    return f"""
    WITH w AS (
      SELECT doc_id, {words} AS word FROM documents
    ),
    freq AS (
      SELECT word, COUNT(*) AS n FROM w GROUP BY word
    ),
    total AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM freq
    ),
    scored AS (
      SELECT w.doc_id,
             CAST(LN(freq.n / tot) AS DECIMAL(30,12)) AS logp
      FROM w JOIN freq ON w.word = freq.word CROSS JOIN total
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM scored
    WHERE doc_id < 300
    GROUP BY doc_id
    ORDER BY doc_id
    """


sql_query(
    "text_unigram_logprob_score",
    _unigram_logprob_sql("spark"),
    oracle=_unigram_logprob_sql("duck"),
    tags=("text", "quality", "language-model"),
    doc="Unigram LM quality score (the classic perplexity-filter stand-"
    "in): corpus unigram frequencies -> per-doc mean log-probability. "
    "Low scorers are gibberish/outliers. Per-token log-probs are cast "
    "to DECIMAL before summing so accumulation order is moot (float "
    "sums of logs are order-sensitive). One word-freq shuffle + one "
    "doc shuffle; the freq table broadcasts at probe time.",
)


def _pagerank_sql(dialect: str, n_iters: int = 3) -> str:
    """Damped PageRank over the near-dup pair graph, iterations unrolled
    as plain CTEs (identical algebra both engines; messages decimal-cast
    so neighbor-sum order is moot)."""
    pair_sql = _minhash_lsh_sql(dialect)
    blocks = [
        f"""pairs AS (
      {pair_sql}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src
    ),
    r0 AS (
      SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM edges
    )"""
    ]
    for i in range(1, n_iters + 1):
        blocks.append(f"""m{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(r.rank / deg.d AS DECIMAL(30,15))) AS DOUBLE)
               AS msum
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT r0.node, 0.15 + 0.85 * COALESCE(m{i}.msum, 0.0) AS rank
      FROM r0 LEFT JOIN m{i} ON r0.node = m{i}.node
    )""")
    ctes = ",\n    ".join(blocks)
    return f"""
    WITH {ctes}
    SELECT node AS doc_id, ROUND(rank, 6) AS pagerank
    FROM r{n_iters}
    ORDER BY doc_id
    """


sql_query(
    "graph_pagerank_neardup",
    _pagerank_sql("spark"),
    oracle=_pagerank_sql("duck"),
    tags=("graph", "pagerank", "iterative"),
    doc="Damped PageRank (3 unrolled iterations) over the MinHash near-"
    "dup graph — the central-document signal inside duplicate clusters. "
    "Each iteration is one join + one decimal-summed aggregate on the "
    "edge list (LSH-bounded, not corpus-sized); unrolling keeps the "
    "whole thing one declarative plan on both engines.",
)


def _weighted_sample_sql(dialect: str) -> str:
    if dialect == "spark":
        hexint = "CAST(CONV(SUBSTR(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    else:
        hexint = "CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    return f"""
    WITH keyed AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             LN(({hexint} + 1) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
    )
    SELECT doc_id, lang, n_chars, ROUND(es_key, 8) AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT 25
    """


sql_query(
    "sample_weighted_deterministic",
    _weighted_sample_sql("spark"),
    oracle=_weighted_sample_sql("duck"),
    tags=("sampling", "weighted", "deterministic"),
    doc="Deterministic weighted sampling (Efraimidis-Spirakis A-ES): "
    "u = md5-derived uniform per doc, key = ln(u)/weight, top-k by key "
    "= a weight-proportional sample that is identical on any cluster, "
    "any partitioning, any retry — rand()-free. Plans as TopK "
    "(TakeOrderedAndProject), no full sort.",
)


sql_query(
    "events_ordered_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events
      GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS users_total,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS stage_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS stage_click_after_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_buy > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS stage_full_funnel,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_buy > t_click
                     AND t_buy <= t_view + INTERVAL 24 HOUR
               THEN 1 ELSE 0 END) AS BIGINT) AS funnel_within_24h
    FROM firsts
    """,
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events
      GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS users_total,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS stage_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS stage_click_after_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_buy > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS stage_full_funnel,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_buy > t_click
                     AND t_buy <= t_view + INTERVAL 24 HOUR
               THEN 1 ELSE 0 END) AS BIGINT) AS funnel_within_24h
    FROM firsts
    """,
    tags=("events", "funnel", "analytics"),
    doc="Ordered conversion funnel (view -> click -> purchase, with a "
    "24h completion bound): conditional MIN pivot per user then staged "
    "counts — one user_id shuffle, no joins, NULL comparisons fall out "
    "of the funnel naturally.",
)


# --- round 9: incremental dedup, corpus IDF, cohort retention ---------------

sql_query(
    "dedup_incremental_snapshot",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    incoming AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text FROM documents
      WHERE doc_id % 10 = 0
    ),
    fingerprints AS (
      SELECT md5(text) AS text_hash, MIN(doc_id) AS corpus_doc_id
      FROM corpus
      GROUP BY md5(text)
    )
    SELECT i.doc_id AS incoming_doc_id, f.corpus_doc_id, f.text_hash
    FROM incoming i
    JOIN fingerprints f ON md5(i.text) = f.text_hash
    ORDER BY incoming_doc_id
    """,
    tags=("dedup", "exact", "incremental"),
    doc="Incremental dedup — the production shape: a NEW batch is deduped "
    "against an EXISTING corpus snapshot rather than against itself. The "
    "corpus side reduces to a compact (hash, min_doc_id) fingerprint "
    "table (one partial+final agg shuffle over hashes only, never text), "
    "then the incoming batch equi-joins it on md5 — at 100 TB the "
    "fingerprint table is the only state carried between ingest runs and "
    "is orders of magnitude smaller than the corpus; the incoming side "
    "is map-only until the hash join. The fixture is duplicate-free, so "
    "the injected every-10th corpus copies (shifted ids) are exactly the "
    "matches; common-subset SQL, oracle is the same text.",
)


def _idf_rarity_sql(dialect: str) -> str:
    words = _word_stream(dialect)
    return f"""
    WITH w AS (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id, {words} AS word FROM documents
      ) t
    ),
    df AS (
      SELECT word, COUNT(*) AS n_docs_with FROM w GROUP BY word
    ),
    n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ),
    scored AS (
      SELECT w.doc_id,
             CAST(LN((n.n_docs + 1.0) / (df.n_docs_with + 1.0))
                  AS DECIMAL(30,12)) AS idf
      FROM w JOIN df ON w.word = df.word CROSS JOIN n
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
           ROUND(CAST(SUM(idf) AS DOUBLE) / COUNT(*), 6) AS mean_idf
    FROM scored
    WHERE doc_id < 300
    GROUP BY doc_id
    ORDER BY doc_id
    """


sql_query(
    "text_idf_rarity_score",
    _idf_rarity_sql("spark"),
    oracle=_idf_rarity_sql("duck"),
    tags=("text", "quality", "idf"),
    doc="Corpus-level IDF rarity score per document (the boilerplate/"
    "template-page signal: low mean IDF = the page is made of terms "
    "every other page also has; complements text_unigram_logprob_score, "
    "which weights by term frequency instead of document frequency). "
    "Smoothed IDF = ln((N+1)/(df+1)) over DISTINCT (doc, word) pairs; "
    "per-term IDFs are decimal-cast before summing so accumulation "
    "order is moot. Plan: one distinct shuffle, one word-df aggregate "
    "(partial agg first), one join back — at probe time the df table "
    "broadcasts. Output bounded to doc_id < 300; the IDF statistics "
    "are computed over the FULL corpus.",
)


def _retention_cohort_sql(dialect: str) -> str:
    ddiff = (
        "DATEDIFF(d, first_day)"
        if dialect == "spark"
        else "DATE_DIFF('day', first_day, d)"
    )
    return f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(d) AS first_day FROM days GROUP BY user_id
    ),
    offsets AS (
      SELECT DISTINCT days.user_id, firsts.first_day,
             CAST(FLOOR({ddiff} / 7.0) AS INT) AS week_offset
      FROM days JOIN firsts ON days.user_id = firsts.user_id
    )
    SELECT CAST(first_day AS TIMESTAMP) AS cohort_day, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM offsets
    GROUP BY first_day, week_offset
    ORDER BY cohort_day, week_offset
    """


sql_query(
    "events_user_retention_cohort",
    _retention_cohort_sql("spark"),
    oracle=_retention_cohort_sql("duck"),
    tags=("events", "retention", "analytics"),
    doc="Cohort retention: users grouped by first-active day, counted "
    "once per (cohort, week-offset) they return in — the standard "
    "retention triangle. Distinct (user, day) first so per-user event "
    "volume never inflates the shuffle; then one user_id-keyed MIN, "
    "one join (user-keyed, co-partitioned with the distinct), one "
    "cohort aggregate. Dialect-split only on DATEDIFF argument order.",
)


sql_query(
    "join_fuzzy_blocked_levenshtein",
    """
    WITH corpus_names AS (
      SELECT p_name AS name, MIN(p_partkey) AS canonical_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM part GROUP BY p_name
    ),
    probe_names AS (
      SELECT substr(p_name, 1, length(p_name) - 1) AS name,
             MIN(p_partkey + 5000000) AS probe_key
      FROM part WHERE p_partkey % 199 = 0
      GROUP BY substr(p_name, 1, length(p_name) - 1)
    )
    SELECT pr.probe_key, c.canonical_key, c.n_rows,
           CAST(levenshtein(pr.name, c.name) AS INT) AS edit_distance
    FROM probe_names pr
    JOIN corpus_names c
      ON split_part(pr.name, ' ', 1) = split_part(c.name, ' ', 1)
     AND length(c.name) BETWEEN length(pr.name) - 2 AND length(pr.name) + 2
    WHERE levenshtein(pr.name, c.name) <= 2
    ORDER BY probe_key, canonical_key
    """,
    tags=("join", "fuzzy", "entity-resolution"),
    doc="Blocked fuzzy join (entity resolution): probe strings matched "
    "against a corpus under edit distance <= 2, NEVER all-pairs AND "
    "never on raw rows — both sides first collapse to DISTINCT names "
    "carrying multiplicities (one partial+final agg each; the realistic "
    "shape, since entity resolution operates on the distinct-string "
    "table, which is orders of magnitude smaller than the corpus — "
    "this fixture: 64 distinct names over up to 2.2 M part rows, so a "
    "raw-row fuzzy join would emit ~400 M pairs at sf10 while the "
    "distinct-name join emits <= 64 x 64). The equi block key (first "
    "token) turns the cross of distinct names into a hash join, the "
    "length band prunes the block (edit distance <= 2 implies length "
    "delta <= 2), and exact levenshtein verifies only block-local "
    "candidates — the block-then-verify shape of the MinHash/sign-LSH "
    "dedups with a string-metric verifier. Probes are every-199th part "
    "name with the last char dropped (distance 1 to their source, "
    "guaranteed non-vacuous). Common-subset SQL, oracle is the same "
    "text.",
)


def _tfidf_cosine_sql(dialect: str) -> str:
    spark = dialect == "spark"
    sh = _shingles(dialect)
    feats = f"explode({sh})" if spark else f"unnest({sh})"
    return f"""
    WITH feat AS (
      SELECT doc_id, {feats} AS word FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    rare AS (
      SELECT word, COUNT(*) AS df FROM feat GROUP BY word
      HAVING COUNT(*) <= 10
    ),
    tfidf AS (
      SELECT feat.doc_id, feat.word,
             CAST(CAST(LN((n.n_docs + 1.0) / (rare.df + 1.0))
                       AS DECIMAL(30,12)) AS DOUBLE) AS w
      FROM feat JOIN rare ON feat.word = rare.word CROSS JOIN n
    ),
    norms AS (
      SELECT doc_id,
             SQRT(CAST(SUM(CAST(w * w AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
      FROM tfidf GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(CAST(a.w * b.w AS DECIMAL(30,12))) AS DOUBLE) AS dot
      FROM tfidf a JOIN tfidf b
        ON a.word = b.word AND a.doc_id < b.doc_id
      WHERE a.doc_id < 200
      GROUP BY a.doc_id, b.doc_id
    ),
    cos AS (
      SELECT d.doc_a, d.doc_b,
             ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
      FROM dots d
      JOIN norms na ON d.doc_a = na.doc_id
      JOIN norms nb ON d.doc_b = nb.doc_id
    ),
    ranked AS (
      SELECT doc_a, doc_b, cosine,
             ROW_NUMBER() OVER (PARTITION BY doc_a
                                ORDER BY cosine DESC, doc_b) AS rk
      FROM cos
    )
    SELECT doc_a, doc_b, cosine, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3 AND doc_a < 200
    ORDER BY doc_a, rk
    """


sql_query(
    "text_tfidf_topk_similar",
    _tfidf_cosine_sql("spark"),
    oracle=_tfidf_cosine_sql("duck"),
    tags=("text", "similarity", "tfidf", "inverted-index"),
    doc="IDF-weighted shingle-set cosine top-k retrieval via an INVERTED-"
    "INDEX join — the sparse-vector companion to the dense-embedding "
    "ANN family, and the weighted/top-k complement of "
    "dedup_ngram_jaccard (which thresholds an unweighted set overlap). "
    "Features are distinct word 3-shingles (the fixture vocabulary is "
    "31 words, so unigrams have no rare terms — shingles do: 16k "
    "distinct, max df 7 at sf0.01); each doc is a binary shingle "
    "vector weighted by smoothed IDF. The index keeps only rare "
    "features (df <= 10): common features carry no discriminative "
    "signal AND are exactly the ones whose posting lists blow the "
    "self-join up quadratically, so the cap is simultaneously the "
    "quality filter and the scale bound (candidate pairs <= df_cap^2/2 "
    "per feature — linear in vocabulary, independent of corpus size; "
    "the same hot-bucket philosophy as the MinHash/sign-LSH dedups). "
    "Per-feature IDFs are pinned to 12 decimals so both engines weigh "
    "identically; dots and norms are decimal-summed (order-proof), "
    "cosine rounded to 6 before ranking so the ROW_NUMBER order is "
    "identical cross-engine (ties broken by doc_b). Plan: one "
    "(doc,shingle) explode + feature-df agg (rare table broadcasts at "
    "probe scale), the bounded posting-list self-join, two small norm "
    "joins. The probe set (doc_a < 200) is pushed into the pair join — "
    "a filter on the window partition key commutes with the per-doc_a "
    "ranking, so this is the true retrieval shape: probe set x corpus "
    "index, never index x index. IDF statistics and norms are computed "
    "over the FULL corpus; output is top-3 per probe doc.",
)


def _nb_langid_sql(dialect: str) -> str:
    words = _word_stream(dialect)
    return f"""
    WITH train_tokens AS (
      SELECT lang, {words} AS word FROM documents WHERE doc_id % 2 = 0
    ),
    test_tokens AS (
      SELECT doc_id, lang AS actual_lang, {words} AS word
      FROM documents WHERE doc_id % 2 = 1
    ),
    class_counts AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_tokens
      FROM train_tokens GROUP BY lang
    ),
    priors AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_docs
      FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT word) AS DOUBLE) AS v FROM train_tokens
    ),
    word_counts AS (
      SELECT lang, word, CAST(COUNT(*) AS DOUBLE) AS c
      FROM train_tokens GROUP BY lang, word
    ),
    model AS (
      SELECT wc.lang, wc.word,
             CAST(LN((wc.c + 1.0) / (cc.n_tokens + vocab.v))
                  AS DECIMAL(30,12)) AS logp
      FROM word_counts wc
      JOIN class_counts cc ON wc.lang = cc.lang
      CROSS JOIN vocab
    ),
    defaults AS (
      SELECT cc.lang,
             CAST(LN(1.0 / (cc.n_tokens + vocab.v))
                  AS DECIMAL(30,12)) AS logp0,
             CAST(LN(p.n_docs) AS DECIMAL(30,12)) AS logprior
      FROM class_counts cc
      JOIN priors p ON cc.lang = p.lang
      CROSS JOIN vocab
    ),
    scored AS (
      SELECT t.doc_id, t.actual_lang, d.lang AS cand_lang,
             CAST(MAX(d.logprior) + SUM(COALESCE(m.logp, d.logp0))
                  AS DOUBLE) AS score
      FROM test_tokens t
      CROSS JOIN defaults d
      LEFT JOIN model m ON m.lang = d.lang AND m.word = t.word
      GROUP BY t.doc_id, t.actual_lang, d.lang
    ),
    predicted AS (
      SELECT doc_id, actual_lang, cand_lang AS predicted_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY ROUND(score, 6) DESC,
                                         cand_lang) AS rk
      FROM scored
    )
    SELECT actual_lang, predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM predicted WHERE rk = 1
    GROUP BY actual_lang, predicted_lang
    ORDER BY actual_lang, predicted_lang
    """


sql_query(
    "text_naive_bayes_langid",
    _nb_langid_sql("spark"),
    oracle=_nb_langid_sql("duck"),
    tags=("text", "classifier", "langid", "naive-bayes"),
    doc="Trained multinomial Naive Bayes language classifier — counting IS "
    "training, so the whole train/score/evaluate loop is one declarative "
    "plan (no iterative solver): even doc_ids train, odd doc_ids score, "
    "output is the confusion matrix (complements text_langid_heuristic, "
    "which is a fixed stopword rule). Laplace-smoothed log-likelihoods "
    "ln((c+1)/(n_lang+V)) and log-priors are pinned to 12 decimals "
    "pointwise, per-doc scores are decimal-summed (order-proof), and "
    "the argmax is a ROW_NUMBER over the rounded score with the lang "
    "name as tiebreak — identical cross-engine. Unseen words hit the "
    "COALESCE backoff ln(1/(n_lang+V)). Scale: the model is two "
    "aggregates over the training corpus (vocab x langs rows — "
    "megabytes at 100 TB corpus scale) and BROADCASTS to the scoring "
    "join; the per-candidate fan-out is |langs| (bounded), and the "
    "final argmax + confusion matrix are doc-keyed aggs. ",
)


def _pca_power_sql(dialect: str) -> str:
    if dialect == "spark":
        exploded = (
            "SELECT vec_id, pos + 1 AS pos1, CAST(v AS DOUBLE) AS v\n"
            "      FROM embeddings LATERAL VIEW POSEXPLODE(embedding) t AS pos, v"
        )
    else:
        exploded = (
            "SELECT vec_id,"
            " CAST(generate_subscripts(embedding, 1) AS INT) AS pos1,\n"
            "             CAST(unnest(embedding) AS DOUBLE) AS v\n"
            "      FROM embeddings"
        )
    # Three unrolled power iterations: v_{t+1} = normalize(C v_t), starting
    # from the all-ones direction. Every SUM is decimal-pinned so both
    # engines accumulate identically; products/sqrt/div on identical doubles
    # are identical IEEE ops.
    iters = []
    prev = "u0"
    for t in (1, 2, 3):
        iters.append(
            f"""w{t} AS (
      SELECT cov.i AS i,
             CAST(SUM(CAST(cov.c * {prev}.u AS DECIMAL(30,12))) AS DOUBLE) AS w
      FROM cov JOIN {prev} ON cov.j = {prev}.i
      GROUP BY cov.i
    ),
    n{t} AS (
      SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
      FROM w{t}
    ),
    u{t} AS (
      SELECT i, w / n{t}.nrm AS u FROM w{t} CROSS JOIN n{t}
    )"""
        )
        prev = f"u{t}"
    iter_sql = ",\n    ".join(iters)
    return f"""
    WITH x AS (
      {exploded}
    ),
    mu AS (
      SELECT pos1,
             CAST(SUM(CAST(v AS DECIMAL(25,12))) AS DOUBLE) / COUNT(*) AS m
      FROM x GROUP BY pos1
    ),
    m2 AS (
      SELECT a.pos1 AS i, b.pos1 AS j,
             CAST(SUM(CAST(a.v * b.v AS DECIMAL(30,12))) AS DOUBLE) AS sxy,
             COUNT(*) AS n
      FROM x a JOIN x b ON a.vec_id = b.vec_id
      GROUP BY a.pos1, b.pos1
    ),
    cov AS (
      SELECT m2.i, m2.j, m2.sxy / m2.n - ma.m * mb.m AS c
      FROM m2
      JOIN mu ma ON m2.i = ma.pos1
      JOIN mu mb ON m2.j = mb.pos1
    ),
    u0 AS (
      SELECT pos1 AS i, 0.125 AS u FROM mu
    ),
    {iter_sql},
    lam AS (
      SELECT CAST(SUM(CAST(u2.u * w3.w AS DECIMAL(30,12))) AS DOUBLE)
               AS eigenvalue
      FROM u2 JOIN w3 ON u2.i = w3.i
    )
    SELECT u3.i AS dim1, ROUND(u3.u, 8) AS component,
           ROUND(lam.eigenvalue, 8) AS top_eigenvalue
    FROM u3 CROSS JOIN lam
    ORDER BY dim1
    """


sql_query(
    "embedding_pca_power_iteration",
    _pca_power_sql("spark"),
    oracle=_pca_power_sql("duck"),
    tags=("embedding", "pca", "iterative", "linear-algebra"),
    doc="Top principal component of the embedding cloud by POWER ITERATION "
    "— an iterative ML algorithm expressed as one declarative plan, "
    "EXACTLY oracled (not property-oracled): the d x d covariance in "
    "relational form is small enough (64^2 rows) that three unrolled "
    "iterations are just joins+aggs over a tiny table. Covariance via "
    "the moment identity cov = E[xy] - E[x]E[y]: the Gram pass is ONE "
    "self-join on vec_id (d^2 rows per vector, partial-aggregated "
    "map-side before the (i,j) shuffle — the only corpus-sized stage, "
    "linear in rows; at 1000 executors each task emits its local d x d "
    "sums), means are a second linear pass; no centering join against "
    "the raw data. Iterations v <- normalize(C v) start from the "
    "uniform direction (0.125 = 1/sqrt(64)); eigenvalue = Rayleigh "
    "quotient u2' C u2. Every SUM decimal-pinned -> bit-identical "
    "cross-engine; output rounded to 8 decimals. The realistic use: "
    "top-component removal (all-but-the-top common-component "
    "denoising) and PCA whitening ahead of ANN indexing.",
)


def _resample_ffill_sql(dialect: str) -> str:
    if dialect == "spark":
        spine = "explode(sequence(d0, d1, interval 1 day))"
        lastv = "LAST_VALUE(dy.day_value) IGNORE NULLS"
    else:
        spine = "CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)"
        lastv = "LAST_VALUE(dy.day_value IGNORE NULLS)"
    return f"""
    WITH days AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE) AS day_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM days GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, {spine} AS d FROM spans
    ),
    filled AS (
      SELECT s.user_id, s.d, dy.day_value,
             {lastv} OVER (PARTITION BY s.user_id ORDER BY s.d) AS ffill,
             CASE WHEN dy.day_value IS NULL THEN 1 ELSE 0 END AS gap
      FROM spine s
      LEFT JOIN days dy ON s.user_id = dy.user_id AND s.d = dy.d
    )
    SELECT user_id, CAST(d AS TIMESTAMP) AS day_ts,
           ROUND(ffill, 2) AS filled_value, CAST(gap AS INT) AS is_gap
    FROM filled WHERE user_id < 20 ORDER BY user_id, day_ts
    """


sql_query(
    "events_resample_forward_fill",
    _resample_ffill_sql("spark"),
    oracle=_resample_ffill_sql("duck"),
    tags=("events", "timeseries", "resample", "gap-fill"),
    doc="Time-series resampling to a daily grain with forward-fill gap "
    "repair — the feature-engineering step that turns an irregular event "
    "stream into a dense per-entity series (as-of state per day). The "
    "spine is generated PER USER over that user's own active range "
    "(sequence/generate_series explode — spine rows are bounded by "
    "users x span days, linear in users, never a global calendar cross "
    "join), the LEFT JOIN back is co-keyed with the day aggregate's "
    "shuffle, and the fill is one LAST_VALUE IGNORE NULLS window per "
    "user. Day sums decimal-pinned; DATE cast to TIMESTAMP in the final "
    "projection (dialect repr divergence); is_gap marks which rows are "
    "carried values. Dialect split: sequence+explode / generate_series+"
    "unnest and the two engines' IGNORE NULLS placements. Output "
    "bounded to user_id < 20.",
)


sql_query(
    "quality_constraint_report",
    """
    WITH uniq AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys
      FROM orders
    ),
    nulls AS (
      SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_custkey,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_price,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nonpositive_price,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
      FROM orders
    ),
    orphans AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS orphan_lineitems
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ),
    childless AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS childless_orders
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    )
    SELECT u.n_rows, u.n_keys,
           u.n_rows = u.n_keys AS pk_unique,
           n.null_custkey, n.null_price, n.nonpositive_price, n.bad_status,
           o.orphan_lineitems,
           o.orphan_lineitems = 0 AS fk_lineitem_orders_ok,
           c.childless_orders
    FROM uniq u CROSS JOIN nulls n CROSS JOIN orphans o CROSS JOIN childless c
    """,
    tags=("quality", "validation", "constraints"),
    doc="Data-contract validation report as ONE declarative pass — the "
    "expectation-suite shape (null counts, domain checks, PK uniqueness, "
    "FK referential integrity both directions) a production pipeline "
    "runs before promoting an ingest batch. Single-table checks fold "
    "into one scan each (all CASE-sum aggregates); the FK checks are "
    "null-safe anti-join semantics via NOT EXISTS (at scale these "
    "become one shuffle each on the join key, or broadcast when the "
    "parent side is a dim); the four 1-row legs meet in broadcast cross "
    "joins. Booleans make the report self-asserting: pk_unique and "
    "fk_lineitem_orders_ok must be TRUE on a healthy batch; the counts "
    "quantify any violation for triage. Common-subset SQL, oracle is "
    "the same text.",
)


def _skew_report_sql(dialect: str) -> str:
    # Exact p50/p99 of the per-key count distribution. Spark's
    # percentile() and DuckDB's quantile_cont() both use the standard
    # linear-interpolation estimator over sorted values; operands are
    # exact BIGINTs so the interpolation arithmetic is bit-identical.
    if dialect == "spark":
        p50 = "percentile(cnt, 0.5)"
        p99 = "percentile(cnt, 0.99)"
    else:
        p50 = "quantile_cont(cnt, 0.5)"
        p99 = "quantile_cont(cnt, 0.99)"
    return f"""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST({p50} AS DOUBLE) AS p50_cnt,
             CAST({p99} AS DOUBLE) AS p99_cnt
      FROM per_key
    ),
    hot AS (
      SELECT user_id, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
      FROM per_key
    )
    SELECT h.rk AS hot_rank, h.user_id AS hot_key,
           h.cnt AS hot_cnt,
           s.n_keys, s.n_rows, s.max_cnt, s.p50_cnt, s.p99_cnt,
           ROUND(CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows, 6)
             AS skew_ratio,
           CAST(CEIL(CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows)
                AS BIGINT) AS suggested_salt
    FROM hot h CROSS JOIN stats s
    WHERE h.rk <= 5
    ORDER BY hot_rank
    """


sql_query(
    "events_key_skew_report",
    _skew_report_sql("spark"),
    oracle=_skew_report_sql("duck"),
    tags=("quality", "skew", "diagnostics"),
    doc="Shuffle-key skew diagnosis — the report you run BEFORE a big "
    "join/agg on a 100 TB table to decide whether the key needs "
    "salting. One partial+final count per key (map-side combine makes "
    "the shuffle linear in distinct keys, not rows), then a 1-row "
    "stats fold and a top-5 hottest-key window over the tiny per-key "
    "table. skew_ratio = max/mean is exactly the multiple by which the "
    "hottest reducer exceeds the average at any partition count whose "
    "hash spreads keys evenly; suggested_salt = ceil(ratio) is the "
    "salting fan-out that levels it. p50/p99 of the count distribution "
    "separate 'one pathological key' from 'heavy tail everywhere' "
    "(different fixes: broadcast-isolate vs AQE skew split). Dialect "
    "split: percentile vs quantile_cont (same interpolation on exact "
    "BIGINT operands).",
)


sql_query(
    "orders_scd2_status_intervals",
    """
    WITH h AS (
      SELECT o_custkey, o_orderstatus AS status, o_orderdate AS d,
             o_orderkey,
             LAG(o_orderstatus) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders WHERE o_custkey % 50 = 0
    ),
    changes AS (
      SELECT o_custkey, status, d,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY d, o_orderkey) AS seq
      FROM h WHERE prev IS NULL OR prev <> status
    )
    SELECT o_custkey, status,
           CAST(d AS TIMESTAMP) AS valid_from,
           CAST(LEAD(d) OVER (
             PARTITION BY o_custkey ORDER BY seq) AS TIMESTAMP)
             AS valid_to,
           CAST(LEAD(d) OVER (PARTITION BY o_custkey ORDER BY seq)
                IS NULL AS BOOLEAN) AS is_current,
           CAST(seq AS BIGINT) AS version_n
    FROM changes
    ORDER BY o_custkey, version_n
    """,
    tags=("events", "scd2", "dimension", "cdc"),
    doc="Type-2 slowly-changing-dimension build from an append-only "
    "history — the standard warehouse pattern for 'what was this "
    "entity's state AT time t'. Consecutive same-state rows collapse "
    "via one LAG pass (change detection), then LEAD converts change "
    "points into [valid_from, valid_to) intervals with a NULL-open "
    "current row. Both windows share ONE partitioning (o_custkey), so "
    "the whole build is a single shuffle of the filtered history — at "
    "100 TB the per-entity history is rarely more than a few KB, so "
    "the window state stays in-memory per key. Deterministic under "
    "same-day ties: every window orders by (date, o_orderkey) and the "
    "interval sequencing uses the change's ROW_NUMBER, never the bare "
    "date. DATE-typed outputs cast to TIMESTAMP (dialect repr). "
    "Output bounded to the custkey%50 stratum, filtered BEFORE the "
    "shuffle (predicate pushdown keeps the sample cheap at any scale).",
)


def _inverted_index_sql(dialect: str) -> str:
    if dialect == "spark":
        words = (
            "SELECT doc_id, word FROM documents "
            "LATERAL VIEW explode(split(lower(text), '[^a-z]+')) t AS word "
            "WHERE word <> ''"
        )
        postings = (
            "concat_ws(',', array_sort("
            "collect_list(doc_id) FILTER (WHERE rn <= 8)))"
        )
    else:
        words = (
            "SELECT doc_id, unnest(string_split_regex(lower(text), "
            "'[^a-z]+')) AS word FROM documents"
        )
        postings = (
            "array_to_string(list_sort("
            "list(doc_id) FILTER (WHERE rn <= 8)), ',')"
        )
    # Aggregation state is BOUNDED: the naive collect_set(doc_id) +
    # slice would buffer every posting of a stop-word in one aggregate
    # buffer (millions of ids at corpus scale); here the (word, doc_id)
    # dedup aggregate feeds a ROW_NUMBER that tags the 8 smallest
    # doc_ids, and the final collect_list is FILTERed to those — at most
    # 8 elements per word ever held, while the window sort itself is
    # spillable. The window and the final GROUP BY share the word
    # partitioning, so the rewrite costs no extra exchange.
    return f"""
    WITH words AS ({words}),
    wd AS (
      SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS cnt_wd
      FROM words WHERE word <> '' GROUP BY word, doc_id
    ),
    ranked AS (
      SELECT word, doc_id, cnt_wd,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY doc_id) AS rn
      FROM wd
    ),
    idx AS (
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(cnt_wd) AS BIGINT) AS cf,
             {postings} AS first_postings
      FROM ranked GROUP BY word
    )
    SELECT word, df, cf, first_postings
    FROM idx
    ORDER BY df DESC, word
    LIMIT 100
    """


sql_query(
    "text_inverted_index",
    _inverted_index_sql("spark"),
    oracle=_inverted_index_sql("duck"),
    tags=("text", "retrieval", "index"),
    doc="Inverted-index build (term -> document-frequency, collection-"
    "frequency, posting-list prefix) — the retrieval-side data "
    "structure behind decontamination and BM25-style search over a "
    "training corpus. Tokenize is a map-only explode; a (word, doc_id) "
    "dedup aggregate (partial map-side) feeds one word-partitioned "
    "stage where df/cf fold and a ROW_NUMBER window caps the posting "
    "prefix to the 8 smallest doc_ids with BOUNDED aggregation state "
    "(a collect_set-then-slice would buffer a stop-word's millions of "
    "postings in one aggregate buffer; the FILTERed collect_list never "
    "holds more than 8). Prefixes serialize to a comma string so both "
    "engines compare exactly; production would keep the full sorted "
    "array bucketed by term. Output is the 100 highest-df terms with "
    "deterministic (df DESC, word) tie-break. Dialect split: LATERAL "
    "VIEW explode+split vs unnest+string_split_regex, and the two "
    "engines' filtered list-aggregate spellings.",
)


def _trend_forecast_sql(dialect: str) -> str:
    if dialect == "spark":
        dayix = "DATEDIFF(CAST(ts AS DATE), DATE '2024-01-01')"
    else:
        dayix = "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST({dayix} AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST({dayix} AS BIGINT)
    ),
    fit AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(MAX(x) AS BIGINT) AS last_x
      FROM daily GROUP BY event_type
    ),
    coefs AS (
      SELECT event_type, n, last_x,
             CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
             END AS slope,
             CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                  ELSE (CAST(sy AS DOUBLE)
                        - CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n
             END AS icept
      FROM fit
    )
    SELECT event_type, n AS n_days,
           ROUND(slope, 6) AS slope_per_day,
           ROUND(icept, 6) AS intercept,
           ROUND(icept + slope * (last_x + 7), 6) AS forecast_plus7d
    FROM coefs
    ORDER BY event_type
    """


sql_query(
    "events_linear_trend_forecast",
    _trend_forecast_sql("spark"),
    oracle=_trend_forecast_sql("duck"),
    tags=("events", "timeseries", "regression", "forecast"),
    doc="Per-key least-squares trend + linear forecast over the daily "
    "event-count series — capacity-planning over the event stream "
    "('at this growth, where is volume in a week?'). The normal "
    "equations are assembled from INTEGER power sums (x = day index, "
    "y = exact daily count, so sx/sy/sxy/sxx are all exact BIGINTs "
    "whose map-side partial sums commute) — slope and intercept then "
    "come from a handful of IEEE double divisions, bit-identical in "
    "both engines with NO decimal pinning needed; engine regr_slope/"
    "regr_intercept are deliberately avoided because their internal "
    "accumulation order is unspecified. Two narrow shuffles: "
    "(event_type, day) count, then per-event_type fold of 6 numbers. "
    "At 100 TB the daily rollup is the only corpus-sized stage. "
    "Dialect split: DATEDIFF argument order vs DATE_DIFF('day', ...).",
)


def _quantize_int8_sql(dialect: str) -> str:
    if dialect == "spark":
        cells = (
            "SELECT vec_id, pos + 1 AS dim1, CAST(v AS DOUBLE) AS v "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, v"
        )
    else:
        # DuckDB cannot pass a column to lateral generate_series; the
        # fixture embedding width is fixed (64), so the oracle unrolls a
        # constant series and guards it against a width drift with the
        # WHERE i <= len() clause.
        cells = (
            "SELECT vec_id, i AS dim1, CAST(embedding[i] AS DOUBLE) AS v "
            "FROM embeddings, GENERATE_SERIES(1, 64) t(i) "
            "WHERE i <= LEN(embedding)"
        )
    return f"""
    WITH cells AS ({cells}),
    ranges AS (
      SELECT dim1, MIN(v) AS mn, MAX(v) AS mx,
             (MAX(v) - MIN(v)) / 255.0 AS scale
      FROM cells GROUP BY dim1
    ),
    quant AS (
      -- scale = 0 (a constant dimension) must not reach the division:
      -- Spark non-ANSI yields NULL on x/0 while DuckDB IEEE mode yields
      -- inf, so an unguarded constant dim would diverge the engines.
      -- A constant dim quantizes to code 0 with zero error by definition.
      SELECT c.vec_id, c.dim1, c.v, r.scale,
             CASE WHEN r.scale = 0 THEN 0
                  ELSE FLOOR((c.v - r.mn) / r.scale + 0.5) - 128 END AS q,
             CASE WHEN r.scale = 0 THEN 0.0
                  ELSE ABS(c.v - (r.mn
                           + (FLOOR((c.v - r.mn) / r.scale + 0.5))
                             * r.scale)) END AS abs_err
      FROM cells c JOIN ranges r ON c.dim1 = r.dim1
    )
    SELECT q.dim1,
           ROUND(MIN(q.v), 8) AS dim_min,
           ROUND(MAX(q.v), 8) AS dim_max,
           ROUND(MAX(q.scale), 10) AS scale,
           CAST(MIN(q.q) AS BIGINT) AS q_min,
           CAST(MAX(q.q) AS BIGINT) AS q_max,
           ROUND(CAST(SUM(CAST(q.abs_err AS DECIMAL(25,14)))
                      AS DOUBLE) / COUNT(*), 10) AS mean_abs_err,
           CAST(MAX(q.abs_err) <= MAX(q.scale) * 0.5000001 AS BOOLEAN)
             AS within_half_step
    FROM quant q
    WHERE q.dim1 <= 8
    GROUP BY q.dim1
    ORDER BY q.dim1
    """


sql_query(
    "embedding_quantize_int8",
    _quantize_int8_sql("spark"),
    oracle=_quantize_int8_sql("duck"),
    tags=("embedding", "quantization", "compression"),
    doc="Scalar int8 quantization of the embedding table — the 4x "
    "memory/IO reduction that makes a 100 TB float32 vector corpus "
    "servable (per-dim affine [min,max] -> 0..255, stored int8; the "
    "standard pre-step before IVF/PQ indexes probe quantized codes "
    "and re-rank survivors in float). Calibration (per-dim min/max) "
    "is one partial-aggregated shuffle over exploded cells, linear in "
    "corpus size; the quantize pass joins the 64-row range table back "
    "broadcast. Rounding is spelled FLOOR(x + 0.5) in BOTH dialects "
    "(engine round() half-rule conventions differ; floor on IEEE "
    "doubles is bit-identical). Self-asserting within_half_step "
    "proves every cell's reconstruction error <= scale/2 (the 1e-7 "
    "slack covers the float32->double widening of mn). Per-dim "
    "mean_abs_err decimal-pinned. Output: the first 8 dims' "
    "calibration + error profile; q_min/q_max pin the int8 range "
    "[-128, 127].",
)


_MG_K = 12

_MG_ITEMS_SQL = """
    SELECT CAST(user_id % 8 AS BIGINT) AS shard,
           CAST(user_id % (user_id % 31 + 1) AS BIGINT) AS item
    FROM events
"""

# The merge/prune/assert tail is IDENTICAL in both dialects; only how the
# per-shard summaries are produced differs (applyInPandas vs window SQL).
_MG_TAIL_SQL = """
    WITH merged AS (
      SELECT item, CAST(SUM(est) AS BIGINT) AS m
      FROM {summaries} WHERE item >= 0 GROUP BY item
    ),
    t2 AS (
      SELECT COALESCE(MAX(CASE WHEN rk = {k1} THEN m END), 0) AS t
      FROM (SELECT m, ROW_NUMBER() OVER (ORDER BY m DESC, item) AS rk
            FROM merged) r
    ),
    survivors AS (
      SELECT item, merged.m - t2.t AS est
      FROM merged CROSS JOIN t2 WHERE merged.m - t2.t > 0
    ),
    err AS (
      SELECT CAST((SELECT SUM(est) FROM {summaries} WHERE item = -1)
                  + t2.t AS BIGINT) AS err_bound
      FROM t2
    ),
    exact AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c
      FROM ({items}) i GROUP BY item
    ),
    scored AS (
      SELECT e.item, e.c, s.est,
             CAST(SUM(e.c) OVER () AS BIGINT) AS n
      FROM exact e LEFT JOIN survivors s ON e.item = s.item
    ),
    final AS (
      SELECT item, c, est, n,
             CAST(SUM(CASE WHEN c * {k1} > n AND est IS NULL
                           THEN 1 ELSE 0 END) OVER () AS BIGINT) AS hm
      FROM scored
    )
    SELECT f.item, CAST(f.est AS BIGINT) AS est_count,
           f.c AS exact_count, e.err_bound,
           CAST(f.est <= f.c AS BOOLEAN) AS lower_ok,
           CAST(f.c <= f.est + e.err_bound AS BOOLEAN) AS upper_ok,
           CAST(f.hm = 0 AS BOOLEAN) AS all_heavy_present
    FROM final f CROSS JOIN err e
    WHERE f.est IS NOT NULL
    ORDER BY est_count DESC, f.item
"""


def _mg_oracle_sql() -> str:
    k, k1 = _MG_K, _MG_K + 1
    summaries = f"""(
      WITH counts AS (
        SELECT shard, item, CAST(COUNT(*) AS BIGINT) AS c
        FROM ({_MG_ITEMS_SQL}) i GROUP BY shard, item
      ),
      ranked AS (
        SELECT shard, item, c,
               ROW_NUMBER() OVER (PARTITION BY shard
                                  ORDER BY c DESC, item) AS rk
        FROM counts
      ),
      sh_t AS (
        SELECT shard, COALESCE(MAX(CASE WHEN rk = {k1} THEN c END), 0) AS t
        FROM ranked GROUP BY shard
      )
      SELECT c.shard, c.item, c.c - t.t AS est
      FROM counts c JOIN sh_t t ON c.shard = t.shard
      WHERE c.c - t.t > 0
      UNION ALL
      SELECT shard, CAST(-1 AS BIGINT) AS item, t AS est FROM sh_t
    )"""
    return _MG_TAIL_SQL.format(summaries=summaries, items=_MG_ITEMS_SQL, k1=k1)


@query(
    "agg_frequent_items_mergeable",
    oracle=_mg_oracle_sql(),
    tags=("agg", "approx", "sketch", "mergeable", "grouped-map"),
    doc="Mergeable Misra-Gries frequent-items summaries — the bounded-"
    "state heavy-hitter pattern for 100 TB streams: each shard reduces "
    "its items to at most k=12 weighted counters (offline-canonical MG "
    "prune: subtract the (k+1)-th largest count, keep positives — the "
    "prune operation from Agarwal et al.'s Mergeable Summaries), only "
    "those tiny summaries cross shard boundaries, and merging is "
    "counter addition followed by one more prune. The shard pass runs "
    "as applyInPandas with per-group state bounded by the DISTINCT "
    "items of one shard's counts (never raw rows: the exact per-item "
    "count feeding the prune is itself a partial-aggregated groupBy); "
    "a sentinel row (item=-1) carries each shard's subtracted "
    "threshold so the global error bound err <= sum(t_s) + t2 is "
    "exact. EXACTLY oracled, not property-oracled: the prune is "
    "deterministic integer arithmetic ((k+1)-th largest is a multiset "
    "statistic, independent of tie order), so DuckDB reproduces the "
    "identical summary via window SQL. Self-asserting columns pin the "
    "MG guarantees cross-checked against exact counts: est <= true <= "
    "est + err_bound, and every item above n/(k+1) survives — the "
    "exact-count cross-check re-reads the corpus exactly ONCE (total "
    "and heavy-miss fold into the per-item pass as global windows "
    "over the <= |items|-row table, rather than per-CTE rescans). "
    "The item "
    "key is integer-only zipf-ish skew (user_id % (user_id % 31 + 1)) "
    "— no transcendental whose last-ulp could diverge across engines.",
)
def agg_frequent_items_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    load_fixture_tables(spark, sf_dir)
    k, k1 = _MG_K, _MG_K + 1
    items = spark.sql(_MG_ITEMS_SQL)

    def mg_prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cnt = (
            pdf.groupby("item").size().sort_values(ascending=False)
        )
        t = int(cnt.iloc[k]) if len(cnt) > k else 0
        surv = cnt - t
        surv = surv[surv > 0]
        shard = int(pdf["shard"].iloc[0])
        out = pd.DataFrame(
            {
                "shard": shard,
                "item": surv.index.to_numpy(dtype="int64"),
                "est": surv.to_numpy(dtype="int64"),
            }
        )
        sentinel = pd.DataFrame({"shard": [shard], "item": [-1], "est": [t]})
        return pd.concat([out, sentinel], ignore_index=True)

    summaries = items.groupBy("shard").applyInPandas(
        mg_prune, "shard bigint, item bigint, est bigint"
    )
    # Materialize the summaries as a LOCAL relation: the tail SQL
    # consumes them from several CTE branches, and an inlined CTE would
    # re-run the whole shard pass per branch. Driver-size by
    # construction — that is the entire point of a mergeable summary:
    # <= shards x (k+1) rows (104 here; 130k even at 10k shards),
    # regardless of corpus size.
    rows = summaries.collect()
    spark.createDataFrame(
        rows, "shard bigint, item bigint, est bigint"
    ).createOrReplaceTempView("mg_summaries")
    return spark.sql(
        _MG_TAIL_SQL.format(
            summaries="mg_summaries", items=_MG_ITEMS_SQL, k1=k1
        )
    )


_BLOOM_WORDS = 65536  # 32-bit words -> 2,097,152-bit filter


def _bloom_semi_join_sql(dialect: str) -> str:
    nb = _BLOOM_WORDS * 32
    if dialect == "spark":
        def lane(col: str, lo: int) -> str:
            return (
                f"CAST(CONV(SUBSTR(md5(CAST({col} AS STRING)), {lo}, 8), "
                f"16, 10) AS BIGINT) % {nb}"
            )

        wdiv = "DIV"
        mask = "SHIFTLEFT(CAST(1 AS BIGINT), CAST({b} AS INT))"
    else:
        def lane(col: str, lo: int) -> str:
            return (
                f"CAST('0x' || SUBSTR(md5(CAST({col} AS VARCHAR)), {lo}, 8) "
                f"AS BIGINT) % {nb}"
            )

        wdiv = "//"
        mask = "(CAST(1 AS BIGINT) << CAST({b} AS INT))"
    def wb(col: str, lo: int, pfx: str) -> str:
        p = lane(col, lo)
        return (
            f"CAST(({p}) {wdiv} 32 AS BIGINT) AS {pfx}w, "
            f"CAST(({p}) % 32 AS INT) AS {pfx}b"
        )

    return f"""
    WITH build_keys AS (
      SELECT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    ),
    build_bits AS (
      SELECT {wb('k', 1, 'h1')}, {wb('k', 9, 'h2')}, {wb('k', 17, 'h3')}
      FROM build_keys
    ),
    bloom AS (
      SELECT w, CAST(BIT_OR(m) AS BIGINT) AS word FROM (
        SELECT h1w AS w, {mask.format(b='h1b')} AS m FROM build_bits
        UNION ALL
        SELECT h2w AS w, {mask.format(b='h2b')} AS m FROM build_bits
        UNION ALL
        SELECT h3w AS w, {mask.format(b='h3b')} AS m FROM build_bits
      ) bits GROUP BY w
    ),
    probe AS (
      SELECT DISTINCT l_orderkey AS pk FROM lineitem
    ),
    probe_bits AS (
      SELECT pk, {wb('pk', 1, 'h1')}, {wb('pk', 9, 'h2')}, {wb('pk', 17, 'h3')}
      FROM probe
    ),
    candidates AS (
      SELECT p.pk
      FROM probe_bits p
      JOIN bloom g1 ON g1.w = p.h1w
                    AND (g1.word & {mask.format(b='p.h1b')}) <> 0
      JOIN bloom g2 ON g2.w = p.h2w
                    AND (g2.word & {mask.format(b='p.h2b')}) <> 0
      JOIN bloom g3 ON g3.w = p.h3w
                    AND (g3.word & {mask.format(b='p.h3b')}) <> 0
    ),
    truth AS (
      SELECT p.pk FROM probe p
      WHERE EXISTS (SELECT 1 FROM build_keys b WHERE b.k = p.pk)
    ),
    counts AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM build_keys) AS n_build_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probe_keys,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM candidates) AS n_candidates,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
         WHERE t.pk NOT IN (SELECT pk FROM candidates)) AS n_missed
    )
    SELECT n_build_keys, n_probe_keys, n_candidates, n_true,
           n_candidates - n_true AS n_false_pos,
           ROUND(CAST(n_candidates - n_true AS DOUBLE)
                 / (n_probe_keys - n_true), 8) AS fpr,
           CAST(n_missed = 0 AS BOOLEAN) AS no_false_negatives,
           CAST(CAST(n_candidates - n_true AS DOUBLE)
                / (n_probe_keys - n_true) < 0.05 AS BOOLEAN) AS fpr_ok,
           ROUND({nb} / CAST(n_build_keys AS DOUBLE), 2) AS bits_per_key
    FROM counts
    """


sql_query(
    "join_bloom_filter_pruning",
    _bloom_semi_join_sql("spark"),
    oracle=_bloom_semi_join_sql("duck"),
    tags=("join", "bloom", "runtime-filter", "pruning"),
    doc="Bloom-filter semi-join pruning built IN SQL and measured against "
    "the exact semi-join — the runtime-filter pattern that turns a "
    "100 TB fact-scan x selective-dim join into 'ship a 256 KB bitmap "
    "to every task, drop non-candidates before the shuffle'. The "
    "filter is a TABLE of 65536 32-bit words (bit 31 max keeps every "
    "shifted mask positive — no BIGINT overflow in either engine): "
    "build keys fan out to 3 md5 lanes (the same 8-hex-char lane "
    "convention as MinHash), BIT_OR folds them per word, and the probe "
    "side re-derives its 3 (word, bit) coordinates and survives only "
    "if all three broadcast joins find their bit set. Self-asserting: "
    "no_false_negatives MUST be true (Bloom guarantee — a dropped true "
    "match would be a correctness bug, not a tuning miss), fpr_ok pins "
    "the measured false-positive rate under 5% (2M bits vs ~45k keys "
    "even at sf10 -> theoretical fpr ~2e-4), and the exact fpr value "
    "hash-matches cross-engine because the whole filter is "
    "deterministic integer arithmetic. Dialect split: CONV vs '0x' "
    "cast for hex lanes, DIV vs //, SHIFTLEFT vs <<.",
)


def _anomaly_mad_sql(dialect: str) -> str:
    med = "PERCENTILE({}, 0.5)" if dialect == "spark" else "QUANTILE_CONT({}, 0.5)"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (
      SELECT event_type, CAST({med.format('cnt')} AS DOUBLE) AS med
      FROM daily GROUP BY event_type
    ),
    mad AS (
      SELECT d.event_type,
             CAST({med.format('ABS(d.cnt - m.med)')} AS DOUBLE) AS mad
      FROM daily d JOIN med m ON d.event_type = m.event_type
      GROUP BY d.event_type
    )
    SELECT d.event_type, CAST(d.d AS TIMESTAMP) AS day_ts, d.cnt,
           m.med, a.mad,
           CASE WHEN a.mad = 0 THEN NULL
                ELSE ROUND((d.cnt - m.med) / (1.4826 * a.mad), 6)
           END AS robust_z,
           CASE WHEN a.mad = 0 THEN CAST(NULL AS BOOLEAN)
                ELSE CAST(ABS(d.cnt - m.med) > 3 * 1.4826 * a.mad
                          AS BOOLEAN)
           END AS is_anomaly
    FROM daily d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad a ON d.event_type = a.event_type
    ORDER BY d.event_type, day_ts
    """


sql_query(
    "events_anomaly_robust_zscore",
    _anomaly_mad_sql("spark"),
    oracle=_anomaly_mad_sql("duck"),
    tags=("events", "timeseries", "anomaly", "robust-stats"),
    doc="Robust anomaly scoring of the daily event-volume series — "
    "median/MAD instead of mean/stddev, so a single spiky day cannot "
    "poison its own detection threshold (the classic failure of "
    "3-sigma on operational series). Three passes over the tiny daily "
    "rollup (the ONLY corpus-sized stage is the first day-count "
    "aggregate, partial map-side): per-key median, then median of "
    "absolute deviations, then the scored join — at 100 TB the daily "
    "table is keys x days rows, so the percentile folds are "
    "negligible. robust_z = (x - med) / (1.4826 * MAD) is the "
    "consistency-scaled score (1.4826 makes MAD sigma-consistent "
    "under normality); |z| > 3 flags. Exact cross-engine: counts are "
    "BIGINTs, both engines' percentile/quantile_cont use the same "
    "linear interpolation, and the scoring arithmetic is IEEE-"
    "deterministic. Dialect split: PERCENTILE vs QUANTILE_CONT.",
)


def _twap_sql(dialect: str) -> str:
    if dialect == "spark":
        secs = "CAST(UNIX_MICROS(nxt) - UNIX_MICROS(ts) AS BIGINT) / 1000000.0"
    else:
        secs = "CAST(DATE_DIFF('microsecond', ts, nxt) AS BIGINT) / 1000000.0"
    return f"""
    WITH seq AS (
      SELECT user_id, ts, value,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events WHERE event_type = 'purchase'
    ),
    weighted AS (
      SELECT user_id, value, {secs} AS dt
      FROM seq WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CASE WHEN SUM(CAST(dt AS DECIMAL(20,6))) = 0 THEN NULL
                ELSE ROUND(
                  CAST(SUM(CAST(value * dt AS DECIMAL(30,10))) AS DOUBLE)
                  / CAST(SUM(CAST(dt AS DECIMAL(20,6))) AS DOUBLE), 6)
           END AS twap,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(25,8))) AS DOUBLE)
                 / COUNT(*), 6) AS plain_avg
    FROM weighted
    GROUP BY user_id
    HAVING COUNT(*) >= 5
    ORDER BY user_id
    LIMIT 200
    """


sql_query(
    "events_time_weighted_average",
    _twap_sql("spark"),
    oracle=_twap_sql("duck"),
    tags=("events", "timeseries", "twap"),
    doc="Time-weighted average of an irregularly-sampled per-entity "
    "series — the correct 'average state over the period' when "
    "observations arrive unevenly (a plain AVG over-weights bursty "
    "stretches; TWAP holds each value for the interval until the next "
    "observation, the finance/metering convention). One LEAD window "
    "per user (single shuffle, state = one row), then a per-user fold. "
    "Interval lengths are derived from MICROSECOND integer epoch "
    "diffs — exact BIGINTs in both engines (UNIX_MICROS vs "
    "DATE_DIFF('microsecond')) divided by 1e6, so dt is "
    "IEEE-identical; both weighted sums decimal-pinned. plain_avg "
    "sits alongside to show the bias TWAP corrects.",
)


sql_query(
    "events_daily_growth_accounting",
    """
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(d) AS first_d FROM user_days GROUP BY user_id
    ),
    daily AS (
      SELECT ud.d,
             CAST(COUNT(*) AS BIGINT) AS dau,
             CAST(SUM(CASE WHEN ud.d = fs.first_d THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_users
      FROM user_days ud JOIN first_seen fs ON ud.user_id = fs.user_id
      GROUP BY ud.d
    )
    SELECT CAST(d AS TIMESTAMP) AS day_ts, dau, new_users,
           dau - new_users AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT)
             AS cumulative_users
    FROM daily
    ORDER BY day_ts
    """,
    tags=("events", "growth", "retention"),
    doc="Growth accounting over the event stream: DAU split into new "
    "vs returning, plus the cumulative distinct-user curve — computed "
    "EXACTLY without any running-distinct state: a user contributes "
    "'new' only on MIN(day), so the cumulative distinct count is just "
    "a running SUM of new_users (the first-touch decomposition). "
    "Shuffle profile: distinct (user, day) partial-aggregates "
    "map-side (per-user event volume never inflates it), first-seen "
    "is a per-user MIN on the SAME key so AQE co-locates, and the "
    "final window runs over days-only rows (30 here; ~3650 for a "
    "decade — always tiny). Common-subset SQL; DATE cast to "
    "TIMESTAMP for cross-engine repr.",
)


def _pmi_lift_sql(dialect: str) -> str:
    if dialect == "spark":
        words = (
            "SELECT DISTINCT doc_id, word FROM documents "
            "LATERAL VIEW explode(split(lower(text), '[^a-z]+')) t AS word "
            "WHERE LENGTH(word) >= 3"
        )
    else:
        words = (
            "SELECT DISTINCT doc_id, word FROM ("
            "SELECT doc_id, unnest(string_split_regex(lower(text), "
            "'[^a-z]+')) AS word FROM documents) w "
            "WHERE LENGTH(word) >= 3"
        )
    return f"""
    WITH wd AS ({words}),
    df AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS c
      FROM wd GROUP BY word
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM wd),
    mid AS (
      SELECT wd.doc_id, wd.word, df.c
      FROM wd JOIN df ON wd.word = df.word CROSS JOIN n
      WHERE df.c >= 5 AND df.c * 20 <= n.n * 19
    ),
    capped AS (
      SELECT doc_id, word, c FROM (
        SELECT doc_id, word, c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c, word) AS rn
        FROM mid
      ) r WHERE rn <= 64
    ),
    pairs AS (
      SELECT a.word AS word_a, b.word AS word_b,
             CAST(MAX(a.c) AS BIGINT) AS c_a,
             CAST(MAX(b.c) AS BIGINT) AS c_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM capped a JOIN capped b
        ON a.doc_id = b.doc_id AND a.word < b.word
      GROUP BY a.word, b.word
      HAVING COUNT(*) >= 3
    )
    SELECT word_a, word_b, c_a, c_b, c_ab,
           ROUND(CAST(n.n * c_ab AS DOUBLE) / (c_a * c_b), 6) AS lift
    FROM pairs CROSS JOIN n
    ORDER BY lift DESC, word_a, word_b
    LIMIT 20
    """


sql_query(
    "text_pmi_cooccurrence",
    _pmi_lift_sql("spark"),
    oracle=_pmi_lift_sql("duck"),
    tags=("text", "collocation", "pmi"),
    doc="Collocation mining: top word pairs by LIFT (the exp of PMI — "
    "n*c_ab / (c_a*c_b), reported as the exact integer ratio instead "
    "of its log so no transcendental can diverge in the last ulp "
    "cross-engine). The pair join is the classic quadratic hazard, "
    "BOUNDED the same way text_tfidf_topk_similar bounds its posting "
    "lists, twice over: a RELATIVE df band (5 <= df <= 0.95n, spelled "
    "in overflow-safe integer arithmetic) gates entry to the "
    "doc-keyed self-join, and a hard per-doc cap (the 64 rarest "
    "admitted words per doc, rarest-first so the informative tail "
    "wins) bounds fan-out at <= 64^2 pairs per doc NO MATTER what "
    "the vocabulary does — total pair volume is linear in corpus "
    "size by construction, at any df distribution (the fixture's "
    "~30-word near-universal vocabulary sails under the cap; a "
    "natural corpus' stop-words get rank-dropped). Distinct (doc, word) "
    "first so repeated mentions don't inflate support; MIN support 3 "
    "prunes flukes before ranking. The df side-table joins in "
    "broadcast-sized form at any corpus scale (mid-band vocabulary).",
)


def _profile_sql(dialect: str) -> str:
    cols = [
        ("o_orderkey", "CAST(o_orderkey AS STRING)"),
        ("o_custkey", "CAST(o_custkey AS STRING)"),
        ("o_orderstatus", "o_orderstatus"),
        ("o_totalprice",
         "CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS STRING)"),
        # via DATE: a tz-tagged parquet TIMESTAMP (the scaled fixtures
        # surface as TIMESTAMPTZ in DuckDB) would stringify with a
        # '+00' suffix on one engine only
        ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS STRING)"),
        ("o_orderpriority", "o_orderpriority"),
    ]
    if dialect == "spark":
        args = ", ".join(f"'{n}', {e}" for n, e in cols)
        long_form = (
            f"SELECT col, val FROM orders "
            f"LATERAL VIEW stack({len(cols)}, {args}) s AS col, val"
        )
    else:
        legs = " UNION ALL ".join(
            f"SELECT '{n}' AS col, {e.replace('AS STRING', 'AS VARCHAR')} "
            f"AS val FROM orders"
            for n, e in cols
        )
        long_form = legs
    return f"""
    WITH long_form AS ({long_form}),
    base AS (
      SELECT col,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(val) AS BIGINT) AS n_filled,
             CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
             MIN(val) AS min_str, MAX(val) AS max_str
      FROM long_form GROUP BY col
    ),
    vc AS (
      SELECT col, val, CAST(COUNT(*) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY col
                                ORDER BY COUNT(*) DESC, val) AS rk
      FROM long_form WHERE val IS NOT NULL GROUP BY col, val
    )
    SELECT b.col, b.n_rows, b.n_rows - b.n_filled AS n_nulls,
           b.n_distinct, b.min_str, b.max_str,
           v.val AS top_value, v.c AS top_count
    FROM base b JOIN vc v ON b.col = v.col AND v.rk = 1
    ORDER BY b.col
    """


sql_query(
    "catalog_table_profile",
    _profile_sql("spark"),
    oracle=_profile_sql("duck"),
    tags=("catalog", "profiling", "quality"),
    doc="One-pass column profiler (the stats panel behind a `schema`/"
    "`describe` CLI: null count, distinct count, min/max, modal value) "
    "in LONG form — stack/UNPIVOT the table to (column, value-as-"
    "string) rows and profile all columns through ONE aggregation "
    "pipeline instead of N per-column scans; a naive SELECT with six "
    "COUNT(DISTINCT col_i) would plan a 6-way Expand (6x the scan "
    "rows through the shuffle — the Expand hazard test_plans pins "
    "elsewhere), while the long form shuffles each value exactly "
    "once. Values stringify through engine-stable reprs (DECIMAL for "
    "the double column, native for strings/ints/timestamps); min/max "
    "are therefore lexicographic — documented profile semantics, "
    "deterministic everywhere. Modal value tie-breaks (count DESC, "
    "value ASC). Dialect split: stack() vs UNION ALL legs (DuckDB's "
    "UNPIVOT types conflict across mixed columns).",
)


_SCD2_CHANGES_SQL = """
      SELECT o_custkey AS k, status, d AS ts, seq FROM (
        SELECT o_custkey, status, d,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, d
                                  ORDER BY seq DESC) AS last_at_ts,
               seq
        FROM (
          SELECT o_custkey, o_orderstatus AS status, o_orderdate AS d,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS seq,
                 LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey)
                   AS prev
          FROM orders WHERE o_custkey % 50 = 0
        ) h WHERE prev IS NULL OR prev <> status
      ) c WHERE last_at_ts = 1
"""

_SCD2_PROBES_SQL = """
      SELECT o.o_custkey AS k, l.l_shipdate AS ts, l.l_orderkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey % 50 = 0 AND l.l_linenumber = 1
"""


sql_query(
    "orders_scd2_asof_lookup",
    f"""
    WITH changes AS ({_SCD2_CHANGES_SQL}),
    probes AS ({_SCD2_PROBES_SQL}),
    tagged AS (
      SELECT k, ts, 0 AS side, seq, status,
             CAST(NULL AS BIGINT) AS l_orderkey
      FROM changes
      UNION ALL
      SELECT k, ts, 1 AS side, CAST(0 AS BIGINT) AS seq,
             CAST(NULL AS STRING) AS status, l_orderkey
      FROM probes
    ),
    carried AS (
      SELECT k, ts, side, l_orderkey,
             LAST_VALUE(status) IGNORE NULLS OVER (
               PARTITION BY k ORDER BY ts, side, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS status_asof
      FROM tagged
    )
    SELECT k AS o_custkey, l_orderkey, CAST(ts AS TIMESTAMP) AS ship_ts,
           status_asof
    FROM carried WHERE side = 1
    ORDER BY o_custkey, l_orderkey
    """,
    oracle=f"""
    WITH changes AS ({_SCD2_CHANGES_SQL}),
    probes AS ({_SCD2_PROBES_SQL})
    SELECT p.k AS o_custkey, p.l_orderkey, CAST(p.ts AS TIMESTAMP) AS ship_ts,
           c.status AS status_asof
    FROM probes p ASOF LEFT JOIN changes c
      ON p.k = c.k AND p.ts >= c.ts
    ORDER BY o_custkey, l_orderkey
    """,
    tags=("events", "scd2", "asof", "temporal-join"),
    doc="Point-in-time lookup against the SCD2 dimension built by "
    "orders_scd2_status_intervals: for each shipment, the customer's "
    "status AS OF the ship date — the warehouse question SCD2 exists "
    "to answer. Spark side is the union + carry-forward window (the "
    "same sort-merge shape as operators/asof.py: one shuffle of "
    "changes+probes on the key, one per-partition sort, state = one "
    "carried value per key — no range join, no interval explosion); "
    "the ORACLE deliberately uses DuckDB's NATIVE ASOF LEFT JOIN, so "
    "two structurally different algorithms must agree row-for-row. "
    "Same-day status flips collapse to the last change of the day "
    "before the lookup (both engines see one change per (key, ts), "
    "removing tie ambiguity); change rows sort before probe rows at "
    "equal ts (ts >= semantics, matching ASOF's p.ts >= c.ts). "
    "Probes pre-filtered to the custkey stratum and linenumber 1, "
    "pushed below the orders join.",
)


_QUANTILE_BIN_TAIL = """
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_in_bin
    FROM {binned}
    GROUP BY decile
    ORDER BY decile
    """


@query(
    "features_quantile_binning",
    oracle="""
    WITH binned AS (
      SELECT o_orderkey, o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    """
    + _QUANTILE_BIN_TAIL.format(binned="binned"),
    tags=("features", "binning", "quantile"),
    doc="Equi-depth decile binning of a continuous feature — the "
    "feature-engineering discretizer AND the boundary planner behind "
    "repartitionByRange (the lo/hi fences of each bin are exactly the "
    "range-partition split points that balance a skewed write). NTILE "
    "over a TOTAL order (price, orderkey) is deterministic down to the "
    "row — identical bin populations, not just similar fences. r10: the "
    "Spark side no longer pays a single-partition global window — "
    "operators/globalorder.py range-partitions on the total order, "
    "row-numbers within partitions, adds broadcast offsets, and derives "
    "NTILE arithmetically from the global index (exact same tiling as "
    "the oracle's NTILE by the standard first-r-tiles-get-one-extra "
    "rule). The bin aggregation tail is the same SQL text the oracle "
    "runs. Bin means decimal-pinned.",
)
def features_quantile_binning(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.globalorder import (
        ntile_from_index,
        with_global_order,
    )

    t = load_fixture_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_totalprice")
    ordered, _, n = with_global_order(
        base,
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        index_col="__rn",
    )
    binned = ordered.withColumn("decile", ntile_from_index("__rn", n, 10))
    binned.createOrReplaceTempView("__go_quantile_binned")
    out = spark.sql(_QUANTILE_BIN_TAIL.format(binned="__go_quantile_binned"))
    return transfer_ownership(out, ordered)


def _time_grain_rollup_sql(dialect: str) -> str:
    # Spark spells multi-grain GROUPING SETS over computed columns most
    # robustly via pre-projected grain columns; both engines share that
    # shape. DATE_TRUNC('week') is ISO-Monday in both.
    return """
    WITH g AS (
      SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_g,
             CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS week_g,
             CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month_g,
             event_type, value
      FROM events
    )
    SELECT CASE WHEN day_g IS NOT NULL THEN 'day'
                WHEN week_g IS NOT NULL THEN 'week'
                ELSE 'month' END AS grain,
           COALESCE(day_g, week_g, month_g) AS bucket_ts,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4)
             AS total_value
    FROM g
    GROUP BY GROUPING SETS ((day_g, event_type), (week_g, event_type),
                            (month_g, event_type))
    ORDER BY grain, bucket_ts, event_type
    """


sql_query(
    "events_time_grain_rollup",
    _time_grain_rollup_sql("spark"),
    oracle=_time_grain_rollup_sql("duck"),
    tags=("events", "timeseries", "rollup", "grouping-sets"),
    doc="Multi-granularity time rollup in ONE pass — day, ISO-week and "
    "month aggregates of the event stream via GROUPING SETS over "
    "pre-projected grain columns, the warehouse pattern that feeds a "
    "dashboard's zoom levels without three scans (Spark plans one "
    "Expand x3 over the grain columns only — row width stays narrow "
    "because the grains are projected before the aggregate, and the "
    "explosion is 3x the DAILY rollup input, not 3x raw corpus "
    "columns). Grain identified back from which grouping column is "
    "non-NULL (all three grains are non-null expressions, so COALESCE "
    "is unambiguous). Decimal-pinned sums; identical SQL both "
    "engines; buckets already TIMESTAMP so no repr divergence.",
)


sql_query(
    "pipeline_delete_propagation",
    """
    WITH tombstones AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 499 = 0
    ),
    affected AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS event_rows_hit,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_hit
      FROM events e JOIN tombstones t ON e.user_id = t.user_id
    ),
    survivors AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_after,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_after
      FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM tombstones t
                        WHERE t.user_id = e.user_id)
    ),
    total AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_before FROM events
    ),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leaked
      FROM events e JOIN tombstones t ON e.user_id = t.user_id
      WHERE NOT EXISTS (SELECT 1 FROM tombstones t2
                        WHERE t2.user_id = e.user_id)
    )
    SELECT t.rows_before, a.event_rows_hit, a.users_hit,
           s.rows_after, s.users_after,
           CAST(t.rows_before = a.event_rows_hit + s.rows_after
                AS BOOLEAN) AS partition_exact,
           CAST(l.leaked = 0 AS BOOLEAN) AS no_leak
    FROM total t CROSS JOIN affected a CROSS JOIN survivors s
    CROSS JOIN leak l
    """,
    tags=("pipeline", "deletion", "compliance"),
    doc="Right-to-be-forgotten propagation audit — the report a "
    "deletion pipeline emits before and after applying a tombstone "
    "list: rows/users hit, rows/users surviving the NOT EXISTS "
    "anti-join (the null-safe delete semantics), and two "
    "self-asserting invariants — hit + survivors partitions the table "
    "EXACTLY (nothing dropped or double-counted) and the leak probe "
    "(tombstoned rows that would survive) is structurally zero. At "
    "100 TB the tombstone list broadcasts (it is always tiny relative "
    "to the corpus) and the delete is one anti-join scan; with the "
    "versioned-table writer (operators/versioned.py) the rewrite "
    "commits atomically. All counts exact cross-engine.",
)


def _containment_sql(dialect: str) -> str:
    spark = dialect == "spark"
    shingles = _shingles(dialect)
    if spark:
        inter = "size(array_intersect(a.shingles, b.shingles))"
        sz = "size({}.shingles)"
    else:
        inter = "len(list_intersect(a.shingles, b.shingles))"
        sz = "len({}.shingles)"
    return f"""
    WITH sh AS (
      SELECT doc_id, lang, {shingles} AS shingles
      FROM documents WHERE doc_id < 2000
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND({inter} / CAST({sz.format('a')} AS DOUBLE), 6)
               AS containment_a_in_b,
             ROUND({inter} / CAST({sz.format('b')} AS DOUBLE), 6)
               AS containment_b_in_a,
             ROUND({inter} / CAST(LEAST({sz.format('a')},
                                        {sz.format('b')}) AS DOUBLE), 6)
               AS overlap_coeff
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE {sz.format('a')} > 0 AND {sz.format('b')} > 0
    )
    SELECT doc_a, doc_b, containment_a_in_b, containment_b_in_a,
           overlap_coeff
    FROM pairs
    WHERE overlap_coeff >= 0.5
    ORDER BY doc_a, doc_b
    """


sql_query(
    "dedup_shingle_containment",
    _containment_sql("spark"),
    oracle=_containment_sql("duck"),
    tags=("dedup", "containment", "jaccard"),
    doc="ASYMMETRIC shingle containment |A n B| / |A| (plus the overlap "
    "coefficient) — what Jaccard cannot see: a short document quoted "
    "wholesale inside a much longer one scores near-zero Jaccard "
    "(the union is dominated by the long doc) but containment ~1.0 "
    "for the short side; this is the subset-duplication / quote "
    "detector a curation pipeline runs alongside symmetric near-dup. "
    "Shares the 3-gram shingle builders and lang blocking with "
    "dedup_ngram_jaccard (same scale argument: blocks bound the "
    "pair count at fixture scale, MinHash-LSH candidates replace the "
    "block join at corpus scale). Zero-shingle docs excluded before "
    "any division (no NULL/inf divergence). All three measures are "
    "exact integer-ratio arithmetic, identical cross-engine.",
)


_AUC_SCORED = """
      SELECT doc_id,
             CAST(CAST(lang = 'fr' AS INT) AS BIGINT) AS is_pos,
             CAST(LENGTH(text) AS DOUBLE) AS score
      FROM documents
    """

_AUC_FINAL = """
    SELECT n_pos, n_neg,
           ROUND((CAST(twice_ranksum_pos AS DOUBLE) / 2.0
                  - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1)
                    / 2.0)
                 / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
             AS auc
    FROM {sums}
    """


@query(
    "text_feature_auc_mann_whitney",
    oracle=f"""
    WITH scored AS ({_AUC_SCORED}),
    ranked AS (
      SELECT is_pos,
             RANK() OVER (ORDER BY score) AS r,
             COUNT(*) OVER (PARTITION BY score) AS tie_n
      FROM scored
    ),
    sums AS (
      SELECT CAST(SUM(CASE WHEN is_pos = 1
                           THEN r * 2 + tie_n - 1 ELSE 0 END) AS BIGINT)
               AS twice_ranksum_pos,
             CAST(SUM(is_pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - is_pos) AS BIGINT) AS n_neg
      FROM ranked
    )
    """
    + _AUC_FINAL.format(sums="sums"),
    tags=("text", "metrics", "auc", "evaluation"),
    doc="Exact ROC-AUC via the Mann-Whitney rank identity — classifier/"
    "feature evaluation WITHOUT materializing a threshold sweep: "
    "AUC = (R+ - n+(n+ + 1)/2) / (n+ n-), R+ = tied-average rank sum "
    "of positives. Ties handled exactly in INTEGER arithmetic (avg "
    "rank = min-rank + (tie_n - 1)/2, folded as 2r + tie_n - 1, so "
    "the rank sum stays a BIGINT until one final IEEE division — "
    "bit-identical cross-engine, no sort-order luck). Scores "
    "LENGTH(text) against lang='fr': a weak-but-real separator on "
    "this fixture (fr docs run ~9% longer; measured AUC ~0.557 — an "
    "honest small-signal value, the machinery is the deliverable). "
    "r10: the Spark side needs NO per-row ranking window at all — "
    "RANK's min-rank for a tie group at score s is 1 + (count of "
    "rows below s), so grouping by distinct score (cnt, pos_cnt) "
    "and prefix-summing cnt via operators/globalorder.py gives the "
    "per-group positive contribution pos_cnt*(2C + cnt + 1) "
    "(= pos_cnt rows each contributing r*2 + tie_n - 1), summed to "
    "the identical BIGINT rank sum. Distinct scores can approach "
    "row cardinality for a continuous model score, hence the "
    "distributed prefix rather than an ordered window; the oracle "
    "keeps the classic two-window form, so two structurally "
    "different algorithms must agree bit-for-bit.",
)
def text_feature_auc_mann_whitney(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.globalorder import with_global_order

    load_fixture_tables(spark, sf_dir)
    per_score = spark.sql(
        f"""
        SELECT score,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(is_pos) AS BIGINT) AS pos_cnt
        FROM ({_AUC_SCORED}) scored
        GROUP BY score
        """
    )
    go_res, _, _ = with_global_order(
        per_score, [F.col("score").asc()], running={"cum_cnt": "cnt"}
    )
    go_res.createOrReplaceTempView("__go_auc_scores")
    out = spark.sql(
        """
        WITH sums AS (
          SELECT CAST(SUM(pos_cnt * (2 * (cum_cnt - cnt) + cnt + 1))
                      AS BIGINT) AS twice_ranksum_pos,
                 CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
                 CAST(SUM(cnt - pos_cnt) AS BIGINT) AS n_neg
          FROM __go_auc_scores
        )
        """
        + _AUC_FINAL.format(sums="sums")
    )
    return transfer_ownership(out, go_res)


def _ewma_sql(dialect: str) -> str:
    if dialect == "spark":
        dayix = "DATEDIFF(CAST(ts AS DATE), DATE '2024-01-01')"
        shift = "SHIFTLEFT(CAST(1 AS BIGINT), CAST(15 - (a.x - b.x) AS INT))"
    else:
        dayix = "DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))"
        shift = "(CAST(1 AS BIGINT) << CAST(15 - (a.x - b.x) AS INT))"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST({dayix} AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST({dayix} AS BIGINT)
    ),
    weighted AS (
      SELECT a.event_type, a.x, a.y AS raw,
             CAST(SUM(b.y * {shift}) AS BIGINT) AS numer,
             CAST(SUM({shift}) AS BIGINT) AS denom
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type
       AND b.x BETWEEN a.x - 15 AND a.x
      GROUP BY a.event_type, a.x, a.y
    )
    SELECT event_type, x AS day_index, raw,
           ROUND(CAST(numer AS DOUBLE) / denom, 6) AS ewma
    FROM weighted
    ORDER BY event_type, day_index
    """


sql_query(
    "events_ewma_smoothing",
    _ewma_sql("spark"),
    oracle=_ewma_sql("duck"),
    tags=("events", "timeseries", "smoothing", "ewma"),
    doc="Exponentially-weighted moving average (alpha = 1/2, 16-day "
    "horizon) of the daily event series — the low-lag smoother behind "
    "alerting baselines — computed EXACTLY: the geometric weights are "
    "INTEGER powers of two (bit shifts, never POWER(): libm exp/ln "
    "can be a ulp off a true power and engines disagree), so "
    "numerator and the self-normalizing denominator (which also "
    "handles series-start truncation correctly) are exact BIGINTs "
    "down to one final IEEE division. The distance-dependent weight "
    "makes this inexpressible as a plain window SUM; the banded "
    "self-join runs on the DAILY rollup (keys x days rows — tiny at "
    "any corpus scale; the corpus-sized stage is only the day-count "
    "aggregate), bounded at 16 partners per row.",
)


sql_query(
    "quality_split_drift_chi2",
    """
    WITH tagged AS (
      SELECT o_orderpriority AS category,
             CAST(o_orderkey % 2 AS INT) AS split
      FROM orders
    ),
    cells AS (
      SELECT category, split, CAST(COUNT(*) AS BIGINT) AS n
      FROM tagged GROUP BY category, split
    ),
    margins AS (
      SELECT c.category, c.split, c.n,
             CAST(SUM(c.n) OVER (PARTITION BY c.category) AS BIGINT)
               AS cat_total,
             CAST(SUM(c.n) OVER (PARTITION BY c.split) AS BIGINT)
               AS split_total,
             CAST(SUM(c.n) OVER () AS BIGINT) AS grand
      FROM cells c
    ),
    terms AS (
      SELECT category, split, n,
             CAST(cat_total AS DOUBLE) * split_total / grand AS expected
      FROM margins
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(COUNT(DISTINCT category) - 1 AS BIGINT) AS dof,
           ROUND(CAST(SUM(CAST((n - expected) * (n - expected) / expected
                               AS DECIMAL(30,12))) AS DOUBLE), 6)
             AS chi2,
           CAST(CAST(SUM(CAST((n - expected) * (n - expected) / expected
                              AS DECIMAL(30,12))) AS DOUBLE)
                < 15.09 AS BOOLEAN) AS no_drift_at_1pct
    FROM terms
    """,
    tags=("quality", "drift", "statistics"),
    doc="Train/test split drift check via the chi-square homogeneity "
    "statistic — the pre-training gate that catches a broken split "
    "(a hash-split must NOT correlate with any feature; here the "
    "o_orderpriority distribution across an orderkey%2 split). "
    "Contingency cells, margins and expected counts come from one "
    "groupBy plus window margins (one pass over the tiny cell "
    "table); chi2 terms are decimal-pinned before the fold so "
    "accumulation order cannot flip the rounded value. "
    "no_drift_at_1pct compares against the chi-square 99th "
    "percentile at dof=4 (15.09, Wilson-Hilferty table value "
    "inlined as a constant: a sound split stays under it; at 100 TB "
    "the statistic's power grows with n, exactly what you want for "
    "a contamination gate). Common-subset SQL, oracle is the same "
    "text.",
)


def _mutual_knn_sql(dialect: str) -> str:
    cos = _cos_pre(dialect, "a.embedding", "b.embedding", "a.nrm", "b.nrm")
    hint = "/*+ REPARTITION(32) */ " if dialect == "spark" else ""
    return f"""
    WITH v AS (
      SELECT {hint}vec_id, embedding, {_norm(dialect, "embedding")} AS nrm
      FROM embeddings WHERE vec_id < 500
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst, {cos} AS cos_raw,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {cos} DESC, b.vec_id) AS rk
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst, cos_raw FROM scored WHERE rk <= 3
    )
    SELECT k1.src AS vec_a, k1.dst AS vec_b,
           ROUND(k1.cos_raw, 6) AS cos_sim
    FROM knn k1 JOIN knn k2
      ON k1.src = k2.dst AND k1.dst = k2.src
    WHERE k1.src < k1.dst
    ORDER BY vec_a, vec_b
    """


sql_query(
    "similarity_mutual_knn_graph",
    _mutual_knn_sql("spark"),
    oracle=_mutual_knn_sql("duck"),
    tags=("similarity", "knn-graph", "clustering"),
    doc="MUTUAL k-nearest-neighbor graph (a edge exists only when each "
    "endpoint ranks in the OTHER's top-3 by cosine) — the standard "
    "noise-robust edge set for density clustering and dedup-cluster "
    "seeding: one-directional kNN links a point into a foreign "
    "cluster through a hub neighbor, mutuality prunes exactly those. "
    "Per-node top-3 is a ranking window over the scored pairs; "
    "mutuality is a self-join of the (already tiny, <= 3n rows) kNN "
    "edge list on the reversed pair. The all-pairs scoring stage is "
    "bounded to the vec_id < 500 slice (the whole sf0.01 corpus; a "
    "fixed-size panel at larger sf) — the production-scale version "
    "feeds these windows from the IVF/LSH candidate stages instead "
    "of all-pairs, as similarity_topk_ivf demonstrates. Cosines "
    "through the shared unrolled-chain dot (same IEEE order both "
    "engines), ROUND(6) on output only.",
)


def _prefix_filter_spark_sql() -> str:
    sh = _spark_shingles()
    return f"""
    WITH docs AS (
      SELECT doc_id, {sh} AS shingles
      FROM documents WHERE doc_id < 2000
    ),
    tok AS (
      SELECT doc_id, sh
      FROM docs LATERAL VIEW explode(shingles) t AS sh
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok GROUP BY doc_id
    ),
    df AS (
      SELECT sh, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY sh
    ),
    ordered AS (
      SELECT t.doc_id, t.sh, s.n,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY d.c, t.sh) AS rn
      FROM tok t
      JOIN df d ON t.sh = d.sh
      JOIN sizes s ON t.doc_id = s.doc_id
    ),
    prefix AS (
      SELECT doc_id, sh FROM ordered
      WHERE rn <= n - (n + 1) DIV 2 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.sh = b.sh AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM cand c
      JOIN tok t1 ON t1.doc_id = c.doc_a
      JOIN tok t2 ON t2.doc_id = c.doc_b AND t2.sh = t1.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 3 * i.i >= sa.n + sb.n
    ORDER BY doc_a, doc_b
    """


def _prefix_filter_oracle_sql() -> str:
    sh = _duck_shingles()
    return f"""
    WITH docs AS (
      SELECT doc_id, {sh} AS shingles
      FROM documents WHERE doc_id < 2000
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT)
               AS i,
             CAST(len(a.shingles) AS BIGINT) AS na,
             CAST(len(b.shingles) AS BIGINT) AS nb
      FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
    FROM pairs
    WHERE 3 * i >= na + nb
    ORDER BY doc_a, doc_b
    """


sql_query(
    "dedup_prefix_filter_jaccard",
    _prefix_filter_spark_sql(),
    oracle=_prefix_filter_oracle_sql(),
    tags=("dedup", "jaccard", "prefix-filter"),
    doc="Set-similarity join by PREFIX FILTERING (the ppjoin/AllPairs "
    "family, Xiao et al. / Bayardo et al. — public literature): for "
    "Jaccard >= 0.5, two shingle sets MUST share a token within each "
    "other's (n - ceil(n/2) + 1)-token prefix when tokens are ordered "
    "rarest-first globally — so candidates come from an equi-join of "
    "PREFIXES (short, rare-token lists that collide seldom) instead "
    "of any all-pairs stage, then exact verification keeps true "
    "matches. The threshold test is the integer identity 3i >= na+nb "
    "(division-free). The ORACLE is the DIRECT all-pairs exact "
    "Jaccard join — a structurally different algorithm — so a "
    "hash-match PROVES the filter's completeness on this corpus "
    "(dropping a true pair = instant mismatch), and the 6 fixture "
    "near-dup pairs keep it non-vacuous. Both sides share the "
    "doc_id < 2000 scope: the fixture's ~30-word vocabulary makes "
    "shingle dfs atypically dense, so the demo bounds the corpus "
    "the way dedup_ngram_jaccard does; on natural corpora prefix "
    "dfs are sparse and the prefix join IS the scale path.",
)


def _bpe_pairs_sql(dialect: str) -> str:
    if dialect == "spark":
        words = (
            "SELECT word FROM documents "
            "LATERAL VIEW explode(split(lower(text), '[^a-z]+')) t AS word "
            "WHERE LENGTH(word) >= 2"
        )
        chars = (
            "SELECT word, pos + 1 AS p, c FROM words "
            "LATERAL VIEW posexplode(split(word, '')) t AS pos, c"
        )
    else:
        words = (
            "SELECT word FROM (SELECT unnest(string_split_regex("
            "lower(text), '[^a-z]+')) AS word FROM documents) w "
            "WHERE LENGTH(word) >= 2"
        )
        chars = (
            "SELECT word, i AS p, word[i] AS c "
            "FROM words, GENERATE_SERIES(1, 64) t(i) "
            "WHERE i <= LENGTH(word)"
        )
    return f"""
    WITH raw_words AS ({words}),
    wfreq AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS m
      FROM raw_words GROUP BY word
    ),
    words AS (SELECT word FROM wfreq),
    chars AS ({chars}),
    adjacent AS (
      SELECT a.c AS left_c, b.c AS right_c, w.m
      FROM chars a
      JOIN chars b ON a.word = b.word AND b.p = a.p + 1
      JOIN wfreq w ON w.word = a.word
    ),
    pair_counts AS (
      SELECT left_c, right_c, CAST(SUM(m) AS BIGINT) AS freq
      FROM adjacent GROUP BY left_c, right_c
    ),
    tot AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS total_pairs FROM pair_counts
    )
    SELECT p.left_c, p.right_c, p.freq,
           ROUND(CAST(p.freq AS DOUBLE) / t.total_pairs, 6) AS pair_share
    FROM pair_counts p CROSS JOIN tot t
    ORDER BY p.freq DESC, p.left_c, p.right_c
    LIMIT 10
    """


sql_query(
    "tokens_bpe_merge_candidates",
    _bpe_pairs_sql("spark"),
    oracle=_bpe_pairs_sql("duck"),
    tags=("tokens", "bpe", "tokenizer"),
    doc="The counting core of byte-pair-encoding tokenizer TRAINING: "
    "the adjacent-symbol pair frequencies whose argmax is the next "
    "BPE merge rule (Sennrich et al., public). Words collapse to "
    "DISTINCT form with a multiplicity weight FIRST (the standard BPE "
    "word-frequency table), so the positional adjacency self-join "
    "runs over unique words only — (word, position) keys are unique, "
    "the join is linear and immune to token-frequency skew ('the' x "
    "100k never meets itself 100k^2 times); pair frequency is then "
    "SUM(multiplicity), partial-aggregated. Full "
    "iterative training repeats this argmax+substitute loop "
    "driver-side over a shrinking symbol table; the corpus-sized "
    "stage each round is exactly this query, so its shuffle profile "
    "IS the trainer's. Top-10 with total-order tie-break; "
    "pair_share's denominator folds in a broadcast 1-row leg. "
    "Dialect split: posexplode+split('') vs generate_series indexing "
    "(constant 64 unrolled, guarded by i <= LENGTH).",
)


_KS_PTS = """
      SELECT v,
             CAST(SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2
      FROM (SELECT o_totalprice AS v, CAST(o_orderkey % 2 AS INT) AS split
            FROM orders) tagged
      GROUP BY v
    """

_KS_TAIL = """
    WITH gaps AS (
      SELECT n1, n2,
             ABS(c1 * n2 - c2 * n1) AS gap_num
      FROM {cdf}
    )
    SELECT MAX(n1) AS n1, MAX(n2) AS n2,
           ROUND(CAST(MAX(gap_num) AS DOUBLE) / (MAX(n1) * MAX(n2)), 8)
             AS ks_d,
           CAST(CAST(MAX(gap_num) AS DOUBLE) / (MAX(n1) * MAX(n2))
                < 1.628 * SQRT((MAX(n1) + MAX(n2))
                               / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)))
                AS BOOLEAN) AS no_drift_at_1pct
    FROM gaps
    """


@query(
    "quality_split_drift_ks",
    oracle=f"""
    WITH pts AS ({_KS_PTS}),
    cdf AS (
      SELECT v,
             CAST(SUM(d1) OVER (ORDER BY v) AS BIGINT) AS c1,
             CAST(SUM(d2) OVER (ORDER BY v) AS BIGINT) AS c2,
             CAST(SUM(d1) OVER () AS BIGINT) AS n1,
             CAST(SUM(d2) OVER () AS BIGINT) AS n2
      FROM pts
    ),
    """
    + _KS_TAIL.format(cdf="cdf").lstrip().removeprefix("WITH"),
    tags=("quality", "drift", "statistics", "ks-test"),
    doc="Two-sample Kolmogorov-Smirnov drift check on a CONTINUOUS "
    "feature across the hash split — the companion to the chi-square "
    "gate (which needs categories): D = max |F1(x) - F2(x)|, computed "
    "EXACTLY as integer cross-multiplied cumulative counts "
    "(|c1*n2 - c2*n1|, no per-row divisions to accumulate error; one "
    "final IEEE division). The CDFs come from per-value grouped "
    "counts + ONE ordered window over distinct values (bounded by "
    "distinct prices, not rows; evaluating D only at sample points "
    "is exact — the CDF gap is constant between them). "
    "no_drift_at_1pct uses the standard large-sample critical value "
    "c(0.01)=1.628 (Smirnov asymptotic, public tables). A sound "
    "orderkey%2 split must pass at any sf. r10: the Spark side's "
    "cumulative counts come from operators/globalorder.py (range-"
    "partitioned prefix sums; distinct prices can approach row "
    "cardinality on a continuous feature, so the former global "
    "ordered window was a corpus-sized single partition) and the "
    "n1/n2 totals are grand-total literals from the same stats job; "
    "the oracle keeps the classic windowed form.",
)
def quality_split_drift_ks(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.globalorder import with_global_order

    load_fixture_tables(spark, sf_dir)
    pts = spark.sql(f"SELECT * FROM ({_KS_PTS})")
    go_res, totals, _ = with_global_order(
        pts, [F.col("v").asc()], running={"c1": "d1", "c2": "d2"}
    )
    cdf = (
        go_res.withColumn("c1", F.col("c1").cast("bigint"))
        .withColumn("c2", F.col("c2").cast("bigint"))
        .withColumn("n1", F.lit(totals["c1"]).cast("bigint"))
        .withColumn("n2", F.lit(totals["c2"]).cast("bigint"))
    )
    cdf.createOrReplaceTempView("__go_ks_cdf")
    out = spark.sql(_KS_TAIL.format(cdf="__go_ks_cdf"))
    return transfer_ownership(out, go_res)


def _winnowing_sql(dialect: str) -> str:
    # k = 8 char-gram, w = 4 window (guarantee: any shared run of
    # >= w + k - 1 = 11 chars yields a shared fingerprint).
    if dialect == "spark":
        pos = (
            "SELECT doc_id, text, p FROM documents "
            "LATERAL VIEW explode(sequence(1, "
            "GREATEST(LENGTH(text) - 7, 0))) t AS p "
            "WHERE LENGTH(text) >= 8"
        )
        h = "CAST(CONV(SUBSTR(md5(SUBSTR(text, p, 8)), 1, 8), 16, 10) AS BIGINT)"
    else:
        # DuckDB cannot take a column bound in lateral generate_series;
        # unroll a constant upper bound (fixture max text length is 874)
        # guarded by the WHERE.
        pos = (
            "SELECT doc_id, text, CAST(p AS BIGINT) AS p "
            "FROM documents, GENERATE_SERIES(1, 1024) t(p) "
            "WHERE LENGTH(text) >= 8 AND p <= LENGTH(text) - 7"
        )
        h = "CAST('0x' || SUBSTR(md5(SUBSTR(text, CAST(p AS INT), 8)), 1, 8) AS BIGINT)"
    return f"""
    WITH pos AS ({pos}),
    grams AS (
      SELECT doc_id, p, {h} AS h FROM pos
    ),
    spans AS (
      SELECT doc_id, p,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
               AS minh,
             CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
               AS n_grams
      FROM grams
    ),
    fp AS (
      SELECT DISTINCT doc_id, minh
      FROM spans WHERE p <= n_grams - 3
    ),
    rare_fp AS (
      SELECT doc_id, minh FROM (
        SELECT doc_id, minh,
               COUNT(*) OVER (PARTITION BY minh) AS fp_df
        FROM fp
      ) f WHERE fp_df <= 10
    ),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM rare_fp a
      JOIN rare_fp b ON b.minh = a.minh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) >= 5
    )
    SELECT doc_a, doc_b, n_shared
    FROM shared
    ORDER BY n_shared DESC, doc_a, doc_b
    LIMIT 50
    """


sql_query(
    "text_winnowing_fingerprints",
    _winnowing_sql("spark"),
    oracle=_winnowing_sql("duck"),
    tags=("text", "fingerprint", "winnowing", "dedup"),
    doc="WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken, the "
    "MOSS algorithm — public): hash every 8-char gram, slide a "
    "4-position window, keep each window's MINIMUM hash — the "
    "guarantee is that any shared substring of >= 11 chars yields a "
    "shared fingerprint, while storage drops to ~2/(w+1) of the gram "
    "stream. Selection by window-min of hash VALUES makes the "
    "fingerprint set independent of tie-position conventions, so the "
    "SQL oracle matches exactly (md5 lanes, the MinHash convention). "
    "The cross-doc join goes through a RARE-fingerprint gate "
    "(doc-frequency <= 10) — boilerplate grams that appear "
    "everywhere never enter the pair join, the same linearity bound "
    "as every other candidate stage in this repo; the gate is a "
    "COUNT window over the minh partitioning (NOT a df side-table "
    "join: at sf10 Catalyst mis-sized that table and tried to "
    "broadcast tens of millions of hashes into the driver — the "
    "window reuses the partitioning the self-join needs anyway). "
    "Output: top "
    "plagiarism-suspect pairs by shared fingerprint count (the "
    "fixture's near-dup pairs dominate). Windows are per-doc "
    "partitions (narrow shuffle on doc_id); grams never leave their "
    "partition before the window min.",
)


sql_query(
    "events_session_attribution",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type, event_id,
             CAST(SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
               AS session_n
      FROM seq
    ),
    entries AS (
      SELECT user_id, session_n, event_type AS entry_channel
      FROM (
        SELECT user_id, session_n, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_n
                                  ORDER BY ts, event_id) AS rn
        FROM sess
      ) f WHERE rn = 1
    )
    SELECT e.entry_channel,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS converting_users,
           CAST(COUNT(*) AS BIGINT) AS attributed_purchases,
           CAST(COUNT(DISTINCT s.user_id || '#' || s.session_n)
                AS BIGINT) AS converting_sessions
    FROM sess s
    JOIN entries e ON s.user_id = e.user_id
                  AND s.session_n = e.session_n
    WHERE s.event_type = 'purchase'
    GROUP BY e.entry_channel
    ORDER BY attributed_purchases DESC, entry_channel
    """,
    tags=("events", "attribution", "sessionization", "funnel"),
    doc="First-touch session attribution: every purchase credits the "
    "event_type that OPENED its session (30-minute inactivity "
    "sessions via the lag/cumsum gaps-and-islands pattern, same "
    "construction events_sessionize_gaps_islands pins) — the "
    "marketing-analytics question 'which entry channel converts'. "
    "All three windows and the entries join share ONE user_id "
    "partitioning, so the whole attribution is a single shuffle of "
    "the event stream plus per-key sorts. Deterministic under "
    "same-timestamp ties (every ordering includes event_id). "
    "Session identity for the distinct count is the composite "
    "user#session string (exact, engine-portable). Common-subset "
    "SQL, oracle is the same text.",
)


sql_query(
    "orders_market_basket_lift",
    """
    WITH basket AS (
      SELECT DISTINCT l_orderkey,
             CAST(l_partkey % 50 AS BIGINT) AS category
      FROM lineitem
    ),
    cat_n AS (
      SELECT category, CAST(COUNT(*) AS BIGINT) AS c
      FROM basket GROUP BY category
    ),
    n AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM basket
    ),
    pairs AS (
      SELECT a.category AS cat_a, b.category AS cat_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.category < b.category
      GROUP BY a.category, b.category
      HAVING COUNT(*) >= 10
    )
    SELECT p.cat_a, p.cat_b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
           ROUND(CAST(n.n_orders * p.c_ab AS DOUBLE)
                 / (ca.c * cb.c), 6) AS lift,
           ROUND(CAST(p.c_ab AS DOUBLE) / ca.c, 6) AS confidence_a_to_b
    FROM pairs p
    JOIN cat_n ca ON p.cat_a = ca.category
    JOIN cat_n cb ON p.cat_b = cb.category
    CROSS JOIN n
    ORDER BY lift DESC, cat_a, cat_b
    LIMIT 25
    """,
    tags=("join", "market-basket", "association-rules"),
    doc="Market-basket association rules over order line items: "
    "support, confidence and lift for category pairs bought "
    "together (the Apriori 2-itemset pass, expressed as one "
    "declarative plan). The basket self-join is bounded exactly "
    "like the PMI query: items collapse to DISTINCT (order, "
    "category) first, so per-order fan-out is capped by the "
    "category vocabulary (50) independent of line-item count, and "
    "total pair volume is linear in orders. Lift is the exact "
    "integer ratio n*c_ab/(c_a*c_b); the category margins join "
    "back broadcast-sized. Support floor (>= 10 orders) prunes "
    "noise pre-ranking. Common-subset SQL, oracle is the same "
    "text.",
)


_RFM_PER_CUST = """
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
                  AS DECIMAL(30,8)) AS monetary
      FROM orders GROUP BY o_custkey
    """

_RFM_TAIL = """
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CASE WHEN r_score = 4 AND f_score = 4 AND m_score = 4
                  THEN 'champion'
                WHEN r_score = 1 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'promising'
                ELSE 'regular' END AS segment
    FROM {scored}
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """


@query(
    "customer_rfm_segmentation",
    oracle=f"""
    WITH per_cust AS ({_RFM_PER_CUST}),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM per_cust
    )
    """
    + _RFM_TAIL.format(scored="scored"),
    tags=("features", "rfm", "segmentation"),
    doc="RFM (recency / frequency / monetary) customer segmentation — "
    "the classic lifecycle-marketing scoring, as one declarative "
    "plan: per-customer aggregates (one shuffle, partial map-side; "
    "monetary decimal-pinned), then three NTILE(4) quartile scores "
    "(each ordering tie-broken by custkey, so bin populations are "
    "deterministic to the row — same guarantee as "
    "features_quantile_binning), folded into the 64-cell RFM cube "
    "with named segments. The three orderings run over the "
    "per-customer rollup (distinct customers, not orders) — still "
    "billions of rows at 100 TB, so r10 replaces the three "
    "single-partition NTILE windows with three chained "
    "operators/globalorder.py passes (range partition + local row "
    "numbers + broadcast offsets, NTILE derived arithmetically from "
    "the global index); the oracle keeps the classic windowed form. "
    "The segment fold tail is the same SQL text the oracle runs.",
)
def customer_rfm_segmentation(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.globalorder import (
        ntile_from_index,
        with_global_order,
    )

    load_fixture_tables(spark, sf_dir)
    cur = spark.sql(f"SELECT * FROM ({_RFM_PER_CUST})")
    owned = []
    for score, key in (
        ("r_score", "last_order"),
        ("f_score", "frequency"),
        ("m_score", "monetary"),
    ):
        go_res, _, n = with_global_order(
            cur,
            [F.col(key).asc(), F.col("o_custkey").asc()],
            index_col="__rn",
        )
        owned.append(go_res)
        cur = go_res.withColumn(
            score, ntile_from_index("__rn", n, 4)
        ).drop("__rn")
    cur.createOrReplaceTempView("__go_rfm_scored")
    out = spark.sql(_RFM_TAIL.format(scored="__go_rfm_scored"))
    return transfer_ownership(out, *owned)


_PARETO_PART_REV = """
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,8))) AS DECIMAL(38,8)) AS rev
      FROM lineitem GROUP BY l_partkey
    """

_PARETO_CLASS_CASE = """
             CASE WHEN cum_rev * 10 <= total_rev * 8 THEN 'A'
                  WHEN cum_rev * 100 <= total_rev * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
    """

# Spark tail: total_rev is a per-row literal (grand total from the
# globalorder stats job), so no join is needed to recover it — the
# oracle's CROSS JOIN against DISTINCT total_rev exists only because
# the windowed form has no literal to hand.
_PARETO_SPARK_TAIL = f"""
    WITH classed AS (
      SELECT l_partkey, rev, total_rev, {_PARETO_CLASS_CASE}
      FROM {{ranked}}
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS class_revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE)
                 / CAST(MAX(total_rev) AS DOUBLE), 6) AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """


@query(
    "lineitem_pareto_abc",
    oracle=f"""
    WITH part_rev AS ({_PARETO_PART_REV}),
    ranked AS (
      SELECT l_partkey, rev,
             CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey)
                  AS DECIMAL(38,8)) AS cum_rev,
             CAST(SUM(rev) OVER () AS DECIMAL(38,8)) AS total_rev
      FROM part_rev
    ),
    classed AS (
      SELECT l_partkey, rev, {_PARETO_CLASS_CASE}
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS class_revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS revenue_share
    FROM (SELECT c.*, r.total_rev AS tot
          FROM classed c CROSS JOIN (SELECT DISTINCT total_rev
                                     FROM ranked) r) x
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    tags=("agg", "pareto", "abc-analysis"),
    doc="Pareto / ABC inventory analysis: parts classified by "
    "cumulative revenue share (A = first 80%, B = to 95%, C = tail) "
    "— the 80/20 skew diagnosis that decides which join keys "
    "deserve broadcast or salting treatment. The running share is "
    "never computed as a per-row DOUBLE division: class boundaries "
    "compare DECIMAL cumulative sums by integer-scaled "
    "cross-multiplication (cum*10 <= total*8), exact in both "
    "engines, so a part straddling the 80% line lands in the same "
    "class everywhere. Deterministic under revenue ties (partkey "
    "tie-break in the cumulative ordering). r10: the Spark side's "
    "cumulative sum comes from operators/globalorder.py (range-"
    "partitioned local prefixes + broadcast per-partition offsets — "
    "decimal addition is associative so the distributed prefix is "
    "bit-exact) and SUM(rev) OVER () becomes the grand-total "
    "LITERAL from the same one stats job — no single-partition "
    "window anywhere; the oracle keeps the classic windowed form, "
    "so two structurally different algorithms must agree.",
)
def lineitem_pareto_abc(spark, sf_dir):
    from bdt_spark.operators.cacheutil import transfer_ownership
    from bdt_spark.operators.globalorder import with_global_order

    load_fixture_tables(spark, sf_dir)
    part_rev = spark.sql(f"SELECT * FROM ({_PARETO_PART_REV})")
    go_res, totals, _ = with_global_order(
        part_rev,
        [F.col("rev").desc(), F.col("l_partkey").asc()],
        running={"cum_rev": "rev"},
    )
    ranked = go_res.withColumn(
        "cum_rev", F.col("cum_rev").cast("decimal(38,8)")
    ).withColumn(
        "total_rev", F.lit(totals["cum_rev"]).cast("decimal(38,8)")
    )
    ranked.createOrReplaceTempView("__go_pareto_ranked")
    out = spark.sql(_PARETO_SPARK_TAIL.format(ranked="__go_pareto_ranked"))
    return transfer_ownership(out, go_res)


def _centroid_drift_sql(dialect: str) -> str:
    if dialect == "spark":
        cells = (
            "SELECT vec_id, label, pos + 1 AS dim1, CAST(v AS DOUBLE) AS v "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, v"
        )
    else:
        cells = (
            "SELECT vec_id, label, i AS dim1, "
            "CAST(embedding[i] AS DOUBLE) AS v "
            "FROM embeddings, GENERATE_SERIES(1, 64) t(i) "
            "WHERE i <= LEN(embedding)"
        )
    return f"""
    WITH cells AS ({cells}),
    halves AS (
      SELECT label, dim1, CAST(vec_id % 2 AS INT) AS split,
             CAST(SUM(CAST(v AS DECIMAL(25,12))) AS DOUBLE) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY label, dim1, CAST(vec_id % 2 AS INT)
    ),
    mu AS (
      SELECT label, dim1,
             MAX(CASE WHEN split = 0 THEN s / n END) AS m0,
             MAX(CASE WHEN split = 1 THEN s / n END) AS m1
      FROM halves GROUP BY label, dim1
    ),
    dist AS (
      SELECT label,
             CAST(SUM(CAST((m0 - m1) * (m0 - m1) AS DECIMAL(30,18)))
                  AS DOUBLE) AS sq_l2
      FROM mu GROUP BY label
    )
    SELECT label, ROUND(sq_l2, 10) AS centroid_sq_l2,
           CAST(sq_l2 < 0.05 AS BOOLEAN) AS no_drift
    FROM dist
    ORDER BY label
    """


sql_query(
    "embedding_centroid_drift",
    _centroid_drift_sql("spark"),
    oracle=_centroid_drift_sql("duck"),
    tags=("embedding", "drift", "quality"),
    doc="EMBEDDING drift check — the vector companion to the chi-square "
    "(categorical) and KS (continuous scalar) split gates: per-label "
    "centroid of each hash-split half, squared L2 distance between "
    "the halves' centroids. A sound split gives near-zero distance "
    "(sampling noise ~ 2*d*var/n); a drifted embedding version, a "
    "re-normalization bug, or a split that correlates with content "
    "shows up as a per-label distance jump. One (label, dim, split) "
    "partial-aggregated shuffle over the exploded cells — linear in "
    "corpus, the 64-row-per-label centroid table is free. Per-dim "
    "means decimal-pinned, the squared-difference fold decimal-"
    "pinned again (the values are ~1e-4; DECIMAL(30,18) keeps every "
    "bit). The no_drift bound is loose by design (0.05 across sf "
    "0.001-10; measured sf0.01 values sit at ~1e-3).",
)


def _ship_sla_sql(dialect: str) -> str:
    if dialect == "spark":
        lag = ("DATEDIFF(CAST(l.l_shipdate AS DATE), "
               "CAST(o.o_orderdate AS DATE))")
        p = "PERCENTILE(lag_days, ARRAY(0.5, 0.9, 0.99))"
        idx = ["[0]", "[1]", "[2]"]
    else:
        lag = ("DATE_DIFF('day', CAST(o.o_orderdate AS DATE), "
               "CAST(l.l_shipdate AS DATE))")
        p = "QUANTILE_CONT(lag_days, [0.5, 0.9, 0.99])"
        idx = ["[1]", "[2]", "[3]"]
    return f"""
    WITH lags AS (
      SELECT l.l_returnflag AS flag,
             CAST({lag} AS BIGINT) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pct AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_items,
             {p} AS q
      FROM lags GROUP BY flag
    )
    SELECT flag, n_items,
           CAST(q{idx[0]} AS DOUBLE) AS p50_days,
           CAST(q{idx[1]} AS DOUBLE) AS p90_days,
           CAST(q{idx[2]} AS DOUBLE) AS p99_days
    FROM pct
    ORDER BY flag
    """


sql_query(
    "lineitem_shipping_sla_percentiles",
    _ship_sla_sql("spark"),
    oracle=_ship_sla_sql("duck"),
    tags=("events", "sla", "percentiles", "latency"),
    doc="Order-to-ship latency SLA percentiles per return-flag cohort "
    "— the p50/p90/p99 latency report pattern, over the orders-"
    "lineitem join. Day lags are exact BIGINTs (DATEDIFF of DATE "
    "casts); both engines' percentile/quantile_cont interpolate "
    "identically on exact integers, and the multi-quantile ARRAY "
    "form computes all three in ONE sort per group instead of "
    "three. The join shuffles on orderkey once; the percentile fold "
    "runs per flag cohort. Dialect split: DATEDIFF arg order, "
    "percentile spelling, and Spark 0-based vs DuckDB 1-based "
    "array indexing.",
)


sql_query(
    "orders_priority_mix_shift",
    """
    WITH monthly AS (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS m,
             o_orderpriority AS prio,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP),
               o_orderpriority
    ),
    shares AS (
      SELECT m, prio, n,
             CAST(SUM(n) OVER (PARTITION BY m) AS BIGINT) AS m_total
      FROM monthly
    ),
    deltas AS (
      SELECT m, prio, n,
             ROUND(CAST(n AS DOUBLE) / m_total, 6) AS share,
             ROUND(CAST(n AS DOUBLE) / m_total
                   - LAG(CAST(n AS DOUBLE) / m_total) OVER (
                       PARTITION BY prio ORDER BY m), 6) AS share_mom_delta
      FROM shares
    )
    SELECT m AS month_ts, prio, n, share, share_mom_delta
    FROM deltas
    WHERE m >= TIMESTAMP '1998-01-01'
    ORDER BY month_ts, prio
    """,
    tags=("events", "composition", "timeseries"),
    doc="Composition-shift report: each month's order-priority mix and "
    "its month-over-month share delta — the 'did the category mix "
    "move' monitoring view (a sustained delta means upstream behavior "
    "changed even when totals look flat). One month+category rollup "
    "(partial map-side, the only corpus-sized stage), a per-month "
    "total window and a per-category LAG window over the tiny "
    "monthly table. Shares are int/int IEEE divisions; the MoM delta "
    "subtracts two such exact doubles before one ROUND. Output "
    "bounded to the final fixture year. Common-subset SQL.",
)
