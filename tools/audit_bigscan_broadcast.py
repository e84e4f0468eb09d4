"""Mid-decade static plan audit: flag BroadcastExchange builds that scan
a fact table, across every query buildable on a relational shard.

The r13 q21 midpoint death, generalized (planaudit.broadcast_over_big_scan):
a selective filter over a corpus-scale scan statically shrinks the
relation under the broadcast threshold, and the true build blows the
heap — a plan that happens to work at the sizes where its estimate
happens to be honest, and is a dead job one decade up. Fixture-scale
audits can't see this class (everything is broadcastable at sf0.001),
so this tool registers a REAL mid-decade shard (default /tmp/sf30,
K=300: 1.9 GB lineitem / 45M orders / 4.5M customer) and walks the
statically-planned executedPlan of every query whose tables exist there.
Planning only — no job runs; ~2 min for the full registry.

Flags are a WORKLIST, not failures: each hit is either (a) bounded by a
pushed probe-set/key filter (safe at any scale — document it), or
(b) a categorical/status/date filter whose true output scales with the
corpus (q21-class: pin the join strategy or gate the plan).

Usage: python tools/audit_bigscan_broadcast.py [sf_dir] [table ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BIG = ("lineitem", "orders", "customer", "part", "partsupp", "supplier")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf30"
    big = set(sys.argv[2:]) or set(DEFAULT_BIG)

    import bdt_spark.plans as plans
    from bdt_spark.planaudit import broadcast_over_big_scan
    from bdt_spark.session import get_spark
    from bdt_spark.sources.io import load_fixture_tables

    spark = get_spark("bigscan_audit", shuffle_partitions=64)
    load_fixture_tables(spark, sf_dir, force=True)

    hits: dict[str, list[str]] = {}
    skipped: list[str] = []
    seen: set[str] = set()
    n_built = 0
    for name in sorted(plans.all_queries()):
        try:
            df = plans.get_query(name).fn(spark, sf_dir)
        except Exception as e:
            skipped.append(f"{name}: {type(e).__name__}")
            continue
        n_built += 1
        flagged = broadcast_over_big_scan(df, big, seen_roots=seen)
        if flagged:
            hits[name] = flagged
    print(f"built {n_built} queries at {sf_dir}; {len(skipped)} skipped "
          f"(tables absent from shard)", flush=True)
    for name, fl in hits.items():
        print(f"\n{name}:")
        for f in fl:
            print(f"  {f}")
    if not hits:
        # a clean bill only means something next to the evidence of what
        # the matcher actually resolved (r13 ADVICE: substring misses
        # were silent) — print every scan root seen under a broadcast
        print("no BroadcastExchange over a fact-table scan at this shard")
    print(f"\nscan roots seen under BroadcastExchange ({len(seen)}): "
          f"{sorted(seen)}")
    spark.stop()


if __name__ == "__main__":
    main()
