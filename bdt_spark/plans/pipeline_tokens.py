"""Token/packing family: first-fit sequence packing (plain and sharded),
packing efficiency vs best-fit-decreasing, and BPE merge candidates.

Split from plans/pipeline.py (round 11) — registration names, oracles,
and SQL byte-identical to the pre-split module. PACK_BUDGET and
N_PACK_SHARDS remain importable via bdt_spark.plans.pipeline.
"""


from __future__ import annotations

from pyspark.sql import functions as F

from bdt_spark.plans.registry import query, sql_query
from bdt_spark.sources.io import load_fixture_tables


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


# --- round 14: document chunking (tokenize -> CHUNK -> pack) ----------------

CHUNK_TOKENS = 64   # tokens per training chunk
CHUNK_STRIDE = 48   # window stride (overlap = CHUNK_TOKENS - CHUNK_STRIDE)


def _doc_chunking_sql(dialect: str) -> str:
    """Fixed token-window chunking with stride — the pretraining prep
    step between tokenization and sequence packing: long documents
    split into <= CHUNK_TOKENS-token windows every CHUNK_STRIDE tokens
    (16-token overlap keeps context across boundaries), short documents
    pass through as one chunk. All map-only per document: token split,
    window starts, slices, and the chunk hash all live inside the row —
    zero shuffle until the final ORDER BY. chunk_idx = start/stride is
    derived, not positional, so both engines agree without a window
    function."""
    spark = dialect == "spark"
    if spark:
        toks = "split(text, ' ')"
        starts = "explode(sequence(0, n - 1, {s}))"
        chunk = "slice(tokens, s + 1, {c})"
        join = "array_join(chunk, ' ')"
        size = "size"
    else:
        toks = "string_split(text, ' ')"
        starts = "unnest(range(0, CAST(n AS BIGINT), {s}))"
        chunk = "tokens[s + 1 : s + {c}]"
        join = "array_to_string(chunk, ' ')"
        size = "len"
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS tokens, {size}({toks}) AS n
      FROM documents WHERE LENGTH(text) > 0
    ),
    starts AS (
      SELECT doc_id, tokens, n,
             {starts.format(s=CHUNK_STRIDE)} AS s
      FROM toks WHERE n >= 1
    ),
    chunks AS (
      SELECT doc_id, CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
             {chunk.format(c=CHUNK_TOKENS)} AS chunk
      FROM starts
    )
    SELECT doc_id, chunk_idx,
           CAST({size}(chunk) AS BIGINT) AS n_tokens,
           md5({join}) AS chunk_hash
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """


sql_query(
    "tokens_doc_chunking",
    _doc_chunking_sql("spark"),
    oracle=_doc_chunking_sql("duck"),
    tags=("tokens", "chunking"),
    doc=f"Document chunking for pretraining: whitespace-token windows of "
    f"{CHUNK_TOKENS} tokens every {CHUNK_STRIDE} (overlap "
    f"{CHUNK_TOKENS - CHUNK_STRIDE}) — the step between tokenization "
    "and tokens_sequence_packing. Entirely map-only per document "
    "(higher-order functions over the token array, same array-domain "
    "doctrine as the r14 winnowing rewrite: no explode->shuffle of the "
    "token stream), so at 100 TB the chunker adds zero exchanges to "
    "the scan; the chunk hash doubles as the downstream chunk-level "
    "exact-dedup key. Trailing windows keep their true (shorter) "
    "token count.",
)
