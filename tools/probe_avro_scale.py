"""Measure the distributed Avro decode path at fact scale (VERDICT r12 #4).

The oracle-gated `scan_avro_roundtrip` covers nation (25 rows — the avro
file is a driver-side write by design, plans/formats.py), so the
DISTRIBUTED path — multi-block deflate container, range splits over
binaryFile listing, Arrow-batched mapInPandas decode (sources/avro.py,
sources/io.py:_read_avro; reference surface utils.rs:62-64) — had no
fact-scale measurement. This probe:

1. writes a multi-block avro copy of `customer` at a scaled dir
   (default /tmp/sf1) with the repo's own from-spec encoder — CHUNKED
   driver write via pyarrow record batches, so the driver never holds
   the table as Python dicts all at once;
2. reads it back through the SAME extension-dispatch path the CLI uses
   (read_file -> _read_avro -> decode_range splits);
3. oracles a keyed aggregate against the parquet original via DuckDB;
4. reports decode wall time and MB/s (compressed + decoded-uncompressed).

Usage: python tools/probe_avro_scale.py [sf_dir] [reps]
Writes the avro copy next to the probe under /tmp/bdt_avro_probe/.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AVRO_SCHEMA = {
    "type": "record",
    "name": "customer",
    "fields": [
        {"name": "c_custkey", "type": "long"},
        {"name": "c_name", "type": "string"},
        {"name": "c_nationkey", "type": "int"},
        {"name": "c_acctbal", "type": "double"},
        {"name": "c_mktsegment", "type": "string"},
    ],
}


def build_avro(src_parquet: str, dst: str) -> dict:
    """Chunked conversion: stream pyarrow record batches -> dict rows ->
    the repo encoder's block flushes. One container file, many 64 KB
    blocks (range-splittable)."""
    import io as _io
    import json
    import zlib

    import pyarrow.parquet as pq

    from bdt_spark.sources.avro import MAGIC, _make_encoder, _zigzag

    names = [f["name"] for f in AVRO_SCHEMA["fields"]]
    enc = _make_encoder(AVRO_SCHEMA)
    sync = bytes(range(16))
    out = open(dst + ".tmp", "wb")
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(AVRO_SCHEMA).encode(),
        "avro.codec": b"deflate",
    }
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag(len(kb)) + kb)
        out.write(_zigzag(len(v)) + v)
    out.write(_zigzag(0))
    out.write(sync)

    body = bytearray()
    n_block = 0
    n_rows = 0
    n_blocks = 0
    raw_bytes = 0

    def flush():
        nonlocal body, n_block, n_blocks, raw_bytes
        if not n_block:
            return
        raw_bytes += len(body)
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = co.compress(bytes(body)) + co.flush()
        out.write(_zigzag(n_block))
        out.write(_zigzag(len(block)))
        out.write(block)
        out.write(sync)
        n_blocks += 1
        body = bytearray()
        n_block = 0

    pf = pq.ParquetFile(src_parquet)
    for batch in pf.iter_batches(batch_size=8192, columns=names):
        cols = {c: batch.column(c).to_pylist() for c in names}
        for i in range(batch.num_rows):
            enc({c: cols[c][i] for c in names}, body)
            n_block += 1
            n_rows += 1
            if len(body) >= 64 << 10:
                flush()
    flush()
    out.close()
    os.replace(dst + ".tmp", dst)
    return {
        "rows": n_rows,
        "blocks": n_blocks,
        "raw_mb": round(raw_bytes / 1e6, 1),
        "file_mb": round(os.path.getsize(dst) / 1e6, 1),
    }


AGG = (
    "SELECT c_mktsegment, COUNT(*) AS n_cust, "
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal, "
    "CAST(SUM(c_nationkey) AS BIGINT) AS sum_nation "
    "FROM {t} GROUP BY c_mktsegment ORDER BY c_mktsegment"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # Optional split-size override (MB). The production AVRO_SPLIT_BYTES
    # is 32 MB — right for a cluster, but a 1.5-15 MB probe file then
    # decodes as ONE task, measuring only single-task decoder throughput.
    # Overriding to ~2 MB here exercises the genuine multi-split path
    # (range decode, block-boundary reconstruction) at probe scale.
    split_mb = float(sys.argv[3]) if len(sys.argv) > 3 else None
    src = os.path.join(sf_dir, "customer.parquet")
    probe_dir = "/tmp/bdt_avro_probe"
    os.makedirs(probe_dir, exist_ok=True)
    tag = os.path.basename(os.path.normpath(sf_dir))
    dst = os.path.join(probe_dir, f"customer_{tag}.avro")

    t0 = time.time()
    if not os.path.exists(dst):
        stats = build_avro(src, dst)
    else:
        stats = {"rows": "cached", "file_mb": round(os.path.getsize(dst) / 1e6, 1)}
    print("encode:", stats, f"{time.time() - t0:.1f}s", flush=True)

    from bdt_spark import sources
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import read_file

    if split_mb is not None:
        sources.io.AVRO_SPLIT_BYTES = int(split_mb * (1 << 20))
    n_splits = -(-os.path.getsize(dst) // sources.io.AVRO_SPLIT_BYTES)
    print(
        f"split bytes {sources.io.AVRO_SPLIT_BYTES >> 20} MB -> "
        f"{n_splits} input splits",
        flush=True,
    )

    spark = get_spark("avro_probe", shuffle_partitions=32)
    # warmup: session + python worker pool
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    times = []
    for _ in range(reps):
        t0 = time.time()
        df = read_file(spark, dst)
        df.createOrReplaceTempView("customer_avro")
        rows = spark.sql(AGG.format(t="customer_avro")).collect()
        times.append(round(time.time() - t0, 2))
    times.sort()
    med = times[len(times) // 2]
    file_mb = os.path.getsize(dst) / 1e6
    print(f"decode+agg runs: {times}  median {med}s")
    print(
        f"throughput: {file_mb / med:.1f} MB/s compressed"
        + (
            f", {stats['raw_mb'] / med:.1f} MB/s decoded"
            if isinstance(stats.get("raw_mb"), (int, float))
            else ""
        )
    )

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{src}')"
    )
    oracle = con.execute(AGG.format(t="customer")).fetchall()
    got = [tuple(r) for r in rows]
    want = [tuple(r) for r in oracle]
    assert got == want, f"avro aggregate diverged:\n{got[:3]}\nvs\n{want[:3]}"
    print(f"oracle: PASS ({len(got)} groups match parquet exactly)")
    spark.stop()


if __name__ == "__main__":
    main()
