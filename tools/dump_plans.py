#!/usr/bin/env python
"""Dump `.explain("formatted")` for registered queries to files.

Usage:
    python tools/dump_plans.py OUTDIR [SF_DIR] [name ...]

Writes OUTDIR/<name>.txt for each matching query (all if no names
given). Uses the tuned session (same as bench.py) so the captured
plans are the ones the driver's bench actually executes. Plans are
captured WITHOUT executing the query (explain only), so a full-registry
dump is cheap. Also prints a one-line summary per query: #Exchange,
join strategies, python-eval nodes — a quick scan surface for the
optimization checklist.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest
    os.makedirs(outdir, exist_ok=True)

    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    picked = sorted(
        n for n in queries if not names or any(s in n for s in names)
    )
    for name in picked:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN FAILED: {exc}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*Join\w*)", plan))
            - {"Join"}
        )
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
            r"FlatMapGroupsInPandas|WindowInPandas)", plan)))
        print(
            f"{name}: exchanges={n_ex} joins={','.join(joins) or '-'} "
            f"python={','.join(py) or '-'}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
