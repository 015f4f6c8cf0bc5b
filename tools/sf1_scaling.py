#!/usr/bin/env python
"""sf1 core-count scaling probe (round 13, VERDICT r12 next #8).

The driver's low-core bench ratios are meaningless at sf0.1: most
entries are sub-second and overhead-dominated, so 8-vs-32-core ratios
of 0.05 and 6.1 both appear and neither is physics. This tool measures
the ratio where it CAN mean something — the sf1 (10x) corpus, where
the headline families run seconds — so "serial at tiny SF" can be told
apart from "serial, period".

Usage:
    python tools/sf1_scaling.py [--entries a,b,c] [--reps N]
    python tools/sf1_scaling.py --worker CPUS [--entries ...]   # internal

The parent launches one subprocess per core count (32 then 8; a Spark
session's master is fixed at startup, so two counts need two JVMs),
each timing the entries best-of-N (default 2) at sf1 with the noop
sink, then writes SCALE_SF1.json and prints a markdown table of
t(c8)/t(c32) per entry. Zero query-code changes — pure measurement.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# ~12 sf1 headline entries spanning the scale-relevant families:
# TPC-H aggregation/join, text-quality map-only, dedup/LSH, embedding
# GEMM, PQ deployment, line-level dedup. Kept to entries measured well
# inside the per-entry cap at sf1 in the r12 sweeps.
DEFAULT_ENTRIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q21_waiting_suppliers",
    "span_trim_audit",
    "bloom_decontamination",
    "knn_label_accuracy",
    "char_entropy_quality",
    "dup_ngram_fraction",
    "c4_line_dedup",
    "pq_rerank_auto",
    "semdedup_horizon_audit",
    "semantic_dedup",
]


def worker(cpus: int, entries: list[str], reps: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from etl_sh_design_spark import registry
    from etl_sh_design_spark.session import get_spark
    from tools.scale_probe import SF10X, build_10x, build_10x_embeddings
    from tools.sf1_bench import build_10x_tpch

    spark = get_spark(app_name=f"sf1_scaling_c{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)
    build_10x_embeddings(spark)
    build_10x_tpch(spark)
    queries = registry.queries()
    out: dict[str, float] = {}
    for name in entries:
        vals: list[float] = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"sf1_scaling c{cpus}: {name}")
            t0 = time.perf_counter()
            try:
                queries[name](spark, SF10X).write.format("noop").mode(
                    "overwrite"
                ).save()
                vals.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:
                print(f"sf1_scaling: {name} FAILED: {exc}", file=sys.stderr)
                break
            finally:
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
        out[name] = min(vals) if vals else -1.0
    print("SF1SCALING " + json.dumps({"cpus": cpus, "queries": out}))


def main() -> int:
    args = sys.argv[1:]
    entries = list(DEFAULT_ENTRIES)
    reps = 2
    if "--entries" in args:
        i = args.index("--entries")
        entries = args[i + 1].split(",")
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if args[:1] == ["--worker"]:
        worker(int(args[1]), entries, reps)
        return 0

    results: dict[int, dict[str, float]] = {}
    for cpus in (32, 8):
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            str(cpus),
            "--entries",
            ",".join(entries),
            "--reps",
            str(reps),
        ]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
        )
        line = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("SF1SCALING ")
        ]
        if proc.returncode != 0 or not line:
            print(proc.stderr[-3000:], file=sys.stderr)
            print(f"worker c{cpus} failed", file=sys.stderr)
            return 1
        results[cpus] = json.loads(line[-1][len("SF1SCALING "):])["queries"]

    rows = []
    for name in entries:
        t32, t8 = results[32].get(name, -1.0), results[8].get(name, -1.0)
        ratio = round(t8 / t32, 2) if t32 and t32 > 0 and t8 > 0 else None
        rows.append({"query": name, "c32_sec": t32, "c8_sec": t8, "ratio": ratio})
    record = {"reps": reps, "sf": 1.0, "rows": rows}
    with open(os.path.join(REPO, "SCALE_SF1.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print("| query | c32 s | c8 s | c8/c32 |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['c32_sec']} | {r['c8_sec']} | "
            f"{r['ratio'] if r['ratio'] is not None else '-'} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
