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

# Round 11: this module was split into family modules (see below) to keep
# each file reviewable; importing THIS module still registers every query
# and re-exports every name the pre-split module defined, so external
# imports (tests, tools/verify_packing.py) keep working unchanged. The
# split was verified zero-drift: all 211 registered (spark SQL, oracle
# SQL, tags, doc) tuples byte-identical before/after.

from bdt_spark.plans import _pipecommon  # noqa: F401
from bdt_spark.plans import pipeline_dedup
from bdt_spark.plans import pipeline_similarity
from bdt_spark.plans import pipeline_text
from bdt_spark.plans import pipeline_tokens
from bdt_spark.plans import pipeline_analytics
from bdt_spark.plans import pipeline_features

for _mod in (_pipecommon, pipeline_dedup, pipeline_similarity, pipeline_text,
             pipeline_tokens, pipeline_analytics, pipeline_features):
    for _name, _val in vars(_mod).items():
        if not _name.startswith('__'):
            globals()[_name] = _val
del _mod, _name, _val
