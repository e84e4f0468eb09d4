"""Dump `explain("formatted")` for named queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <sf_dir> <query ...>

Writes <out_dir>/<query>_<suffix>.txt for each query. Imports bdt_spark
from this script's repo (parent of tools/), so it works from a worktree
checked out at an older commit as well as from HEAD.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bdt_spark.session import get_spark  # noqa: E402
import bdt_spark.plans as plans  # noqa: E402


def main() -> None:
    out_dir, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    for name in names:
        try:
            df = plans.get_query(name).fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # a pre-fix checkout may lack a query
            text = f"<error generating plan: {exc}>\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
