"""Pin the bench's machine contract (VERDICT r12 next #2): the ONE
JSON line the external driver parses must (a) carry exactly the
documented fields, (b) stay bounded well under the driver's stdout
tail, and (c) be the LAST line bench.py prints to stdout.

BENCH_r11's line grew sf1/spread sections until the driver's
tail-bounded capture truncated it mid-JSON and the official
round-over-round comparison was lost; these tests make that shape a
regression instead of a surprise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_contract_line_shape_and_bound():
    # worst realistic case: every HEADLINE entry present with a
    # 4-significant-digit timing (the sweep rounds to 3 decimals)
    headline = {name: 123.456 for name in bench.HEADLINE}
    line = bench.contract_line(9999.999, headline, 0.1)
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert parsed["metric"] == "engine_all_queries_wall_clock"
    assert parsed["unit"] == "sec"
    assert parsed["queries"] == headline
    assert "\n" not in line
    # the driver retains a bounded stdout tail; keep headroom under it
    assert len(line) < 4096, f"contract line grew to {len(line)} bytes"


def test_bench_stdout_last_line_parses():
    """End-to-end: run bench.py on one trivial query at the smoke SF
    and assert the LAST stdout line is the parseable contract line.
    SPARK_GRAFT_BENCH_ONLY skips the sf1 section, so this is one Spark
    session + one tiny query."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "2"
    env["SPARK_GRAFT_BENCH_ONLY"] = "tile_slots"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    parsed = json.loads(lines[-1])  # LAST line must be the contract
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert parsed["value"] >= 0
    assert parsed["sf"] == 0.001
