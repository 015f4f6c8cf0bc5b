"""Property-based cross-engine fuzz: generate filter→groupBy→agg
query specs and run each BOTH as a Spark DataFrame pipeline and as
SQL on DuckDB, asserting identical results. This probes the engine
surface BETWEEN the curated registry queries — expression typing,
null handling, predicate/agg interactions — the way a user composing
ad-hoc pipelines would.

Determinism discipline (same as the registry): fuzzed aggregates are
restricted to exact forms — count / min / max always, sum / avg only
over columns whose sums carry no accumulation-order hazard at this
scale (l_quantity is integer-valued; l_discount is 2dp ~0.1 so a
6k-row sum's representation error is ~1e-15, nine orders under the
6dp rounding grid). derandomize=True pins the example set, so a
green run is reproducible, not a dice roll."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

_NUM_COLS = ["l_quantity", "l_discount"]
_EXACT_COLS = _NUM_COLS + ["l_extendedprice", "l_tax", "l_linenumber"]
_GROUP_COLS = ["l_returnflag", "l_linestatus", "l_shipdate"]
_FILTER_SPECS = [
    ("l_quantity", ">", 25.0),
    ("l_quantity", "<=", 10.0),
    ("l_discount", ">=", 0.05),
    ("l_extendedprice", "<", 20000.0),
    ("l_linenumber", "<=", 3),
    ("l_tax", ">", 0.04),
]

spec = st.fixed_dictionaries(
    {
        "filters": st.lists(
            st.sampled_from(_FILTER_SPECS), min_size=0, max_size=2, unique=True
        ),
        "group": st.sampled_from(_GROUP_COLS),
        "sum_col": st.sampled_from(_NUM_COLS),
        "minmax_col": st.sampled_from(_EXACT_COLS),
        "want_avg": st.booleans(),
    }
)

_OPS = {
    ">": lambda c, v: F.col(c) > v,
    ">=": lambda c, v: F.col(c) >= v,
    "<": lambda c, v: F.col(c) < v,
    "<=": lambda c, v: F.col(c) <= v,
}


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(spec)
def test_fuzzed_filter_group_agg_matches_duckdb(spark, duck, s):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    where = []
    for col, op, val in s["filters"]:
        li = li.filter(_OPS[op](col, val))
        where.append(f"{col} {op} {val}")
    g, sc, mc = s["group"], s["sum_col"], s["minmax_col"]
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(sc), 6).alias("s"),
        F.min(mc).alias("lo"),
        F.max(mc).alias("hi"),
    ]
    sel = [f"count(*) AS n", f"round(sum({sc}), 6) AS s",
           f"min({mc}) AS lo", f"max({mc}) AS hi"]
    if s["want_avg"]:
        aggs.append(F.round(F.avg(sc), 6).alias("m"))
        sel.append(f"round(avg({sc}), 6) AS m")
    sdf = li.groupBy(g).agg(*aggs)
    sql = (
        f"SELECT {g}, {', '.join(sel)} FROM lineitem"
        + (" WHERE " + " AND ".join(where) if where else "")
        + f" GROUP BY {g}"
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:2], drows[:2])


_JOIN_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

join_spec = st.fixed_dictionaries(
    {
        "prios": st.lists(
            st.sampled_from(_JOIN_PRIOS), min_size=1, max_size=3, unique=True
        ),
        "jtype": st.sampled_from(["inner", "left"]),
        "group": st.sampled_from(["o_orderpriority", "l_returnflag"]),
        "qty_cut": st.sampled_from([None, 15.0, 35.0]),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(join_spec)
def test_fuzzed_join_agg_matches_duckdb(spark, duck, s):
    """Join-shaped fuzz: orders (priority-filtered) x lineitem with a
    random join type, optional fact-side predicate, and a grouped
    count/sum — probing join-null and pushdown interactions. For the
    left join, group keys from the null-extended side are excluded
    (a NULL group renders engine-specifically) and the sum column is
    COALESCEd so both engines aggregate the same values."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    prios = s["prios"]
    jtype, g = s["jtype"], s["group"]
    if jtype == "left" and g == "l_returnflag":
        g = "o_orderpriority"  # never group a left join by the null side
    of = o.filter(F.col("o_orderpriority").isin(prios))
    lif = li
    where_li = ""
    if s["qty_cut"] is not None:
        lif = lif.filter(F.col("l_quantity") > s["qty_cut"])
        where_li = f" WHERE l_quantity > {s['qty_cut']}"
    j = of.join(lif, of.o_orderkey == lif.l_orderkey, jtype)
    sdf = j.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.coalesce(F.col("l_quantity"), F.lit(0.0))), 6).alias("s"),
    )
    in_list = ", ".join(f"'{p}'" for p in prios)
    sql = f"""
SELECT {g}, count(*) AS n,
       round(sum(coalesce(l_quantity, 0.0)), 6) AS s
FROM (SELECT * FROM orders WHERE o_orderpriority IN ({in_list})) o
{jtype.upper()} JOIN (SELECT * FROM lineitem{where_li}) l
  ON o.o_orderkey = l.l_orderkey
GROUP BY {g}
"""
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:2], drows[:2])


_WIN_FUNCS = [
    "row_number", "rank", "dense_rank", "lag_cents", "lead_cents",
    "running_cents", "ma3_cents", "ntile4",
]

window_spec = st.fixed_dictionaries(
    {
        "part": st.sampled_from(["o_orderpriority", "o_orderstatus"]),
        "func": st.sampled_from(_WIN_FUNCS),
        "price_cut": st.sampled_from([None, 100000.0, 200000.0]),
        "order_by_date_only": st.booleans(),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(window_spec)
def test_fuzzed_window_matches_duckdb(spark, duck, s):
    """Window-function fuzz over orders: ranking (row_number / rank /
    dense_rank / ntile), offset (lag / lead), and frame (running sum,
    3-row moving avg) functions under a random partition key, optional
    filter, and a tie-FULL vs tie-FREE ordering toggle.

    Determinism discipline: value functions run on integer CENTS
    (CAST(round(o_totalprice*100) AS BIGINT)) so running sums are
    exact integers on both engines — DuckDB's segment-tree window
    aggregation and Spark's streaming frame evaluation then cannot
    diverge by accumulation order. Ranking funcs that depend on row
    identity under ties (row_number, ntile, lag/lead/frames) always
    get the tie-free (o_orderdate, o_orderkey) order; rank/dense_rank
    also exercise the tie-FULL date-only order, where ties must
    resolve identically by SQL semantics, not by luck."""
    tie_sensitive = s["func"] not in ("rank", "dense_rank")
    order_cols = (
        ["o_orderdate", "o_orderkey"]
        if tie_sensitive or not s["order_by_date_only"]
        else ["o_orderdate"]
    )
    part = s["part"]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    where = ""
    if s["price_cut"] is not None:
        o = o.filter(F.col("o_totalprice") < s["price_cut"])
        where = f" WHERE o_totalprice < {s['price_cut']}"
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    o = o.select("o_orderkey", "o_orderdate", part, cents.alias("cents"))

    from pyspark.sql import Window as W

    w = W.partitionBy(part).orderBy(*order_cols)
    order_sql = ", ".join(order_cols)
    over = f"OVER (PARTITION BY {part} ORDER BY {order_sql}"
    if s["func"] == "row_number":
        col, sql_exp = F.row_number().over(w), f"row_number() {over})"
    elif s["func"] == "rank":
        col, sql_exp = F.rank().over(w), f"rank() {over})"
    elif s["func"] == "dense_rank":
        col, sql_exp = F.dense_rank().over(w), f"dense_rank() {over})"
    elif s["func"] == "ntile4":
        col, sql_exp = F.ntile(4).over(w), f"ntile(4) {over})"
    elif s["func"] == "lag_cents":
        col = F.lag("cents", 1).over(w)
        sql_exp = f"lag(cents, 1) {over})"
    elif s["func"] == "lead_cents":
        col = F.lead("cents", 1).over(w)
        sql_exp = f"lead(cents, 1) {over})"
    elif s["func"] == "running_cents":
        col = F.sum("cents").over(w.rowsBetween(W.unboundedPreceding, 0))
        sql_exp = f"sum(cents) {over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    else:  # ma3_cents: exact integer 3-row sum (avg would divide in
        # double; the sum carries the same information hazard-free)
        col = F.sum("cents").over(w.rowsBetween(-2, 0))
        sql_exp = f"sum(cents) {over} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"

    sdf = o.select("o_orderkey", col.cast("bigint").alias("v"))
    sql = f"""
SELECT o_orderkey, CAST({sql_exp} AS BIGINT) AS v
FROM (SELECT o_orderkey, o_orderdate, {part},
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders{where}) t
"""
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:3], drows[:3])


# ----------------------------------------------------------- scalar exprs
# (name, spark Column factory, duckdb SQL) triples with IDENTICAL
# semantics — the §2.8 string/array/date surface probed as compositions
# instead of one-per-function curated queries. Token arrays mirror the
# registry's empty-filtered split; distinct arrays are sorted before
# comparison (set semantics, deterministic order).
_TOKS_SPARK = "filter(split(lower(text), '\\\\s+'), t -> t != '')"
_TOKS_DUCKF = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

_STR_EXPRS = {
    "len": (lambda: F.length("text"), "length(text)"),
    "low8": (lambda: F.substring(F.lower("text"), 1, 8), "substr(lower(text), 1, 8)"),
    "rev12": (
        lambda: F.reverse(F.substring("text", 1, 12)),
        "reverse(substr(text, 1, 12))",
    ),
    "ntok": (
        lambda: F.expr(f"size({_TOKS_SPARK})"),
        f"len({_TOKS_DUCKF})",
    ),
    "first_tok": (
        lambda: F.expr(f"element_at({_TOKS_SPARK}, 1)"),
        f"({_TOKS_DUCKF})[1]",
    ),
    "sorted3": (
        lambda: F.expr(
            f"array_join(slice(array_sort(array_distinct({_TOKS_SPARK})), 1, 3), ',')"
        ),
        f"array_to_string(list_sort(list_distinct({_TOKS_DUCKF}))[1:3], ',')",
    ),
    "has_the": (
        lambda: F.expr(f"cast(array_contains({_TOKS_SPARK}, 'the') as int)"),
        f"CAST(list_contains({_TOKS_DUCKF}, 'the') AS INT)",
    ),
    "pos_a": (lambda: F.instr("text", "a"), "strpos(text, 'a')"),
    "lpad8": (
        lambda: F.lpad(F.substring("text", 1, 5), 8, "*"),
        "lpad(substr(text, 1, 5), 8, '*')",
    ),
    "vowel_gap": (
        lambda: F.regexp_replace(F.substring("text", 1, 20), "[aeiou]", "_"),
        "regexp_replace(substr(text, 1, 20), '[aeiou]', '_', 'g')",
    ),
}

_DATE_EXPRS = {
    "yr": (lambda: F.year("o_orderdate"), "year(o_orderdate)"),
    "mo": (lambda: F.month("o_orderdate"), "month(o_orderdate)"),
    "dom": (lambda: F.dayofmonth("o_orderdate"), "day(o_orderdate)"),
    "plus30": (
        lambda: F.date_add("o_orderdate", 30),
        # duckdb DATE + INTERVAL widens to TIMESTAMP; spark stays DATE
        "CAST(o_orderdate + INTERVAL 30 DAY AS DATE)",
    ),
    "trunc_m": (
        lambda: F.trunc("o_orderdate", "month"),
        "CAST(date_trunc('month', o_orderdate) AS DATE)",
    ),
    "lastday": (lambda: F.last_day("o_orderdate"), "last_day(o_orderdate)"),
    "dd_epoch": (
        lambda: F.datediff("o_orderdate", F.lit("1995-01-01")),
        "datediff('day', DATE '1995-01-01', o_orderdate)",
    ),
}

scalar_spec = st.fixed_dictionaries(
    {
        "str_exprs": st.lists(
            st.sampled_from(sorted(_STR_EXPRS)), min_size=1, max_size=4, unique=True
        ),
        "mod": st.sampled_from([3, 7, 10]),
        "rem": st.sampled_from([0, 1]),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(scalar_spec)
def test_fuzzed_string_array_exprs_match_duckdb(spark, duck, s):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        (F.col("doc_id") % s["mod"]) == s["rem"]
    )
    cols = [F.col("doc_id")] + [
        _STR_EXPRS[n][0]().alias(n) for n in s["str_exprs"]
    ]
    sdf = d.select(*cols)
    sel = ", ".join(f"{_STR_EXPRS[n][1]} AS {n}" for n in s["str_exprs"])
    sql = (
        f"SELECT doc_id, {sel} FROM documents "
        f"WHERE doc_id % {s['mod']} = {s['rem']}"
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:2], drows[:2])


date_spec = st.fixed_dictionaries(
    {
        "date_exprs": st.lists(
            st.sampled_from(sorted(_DATE_EXPRS)), min_size=1, max_size=4, unique=True
        ),
        "prio": st.sampled_from(_JOIN_PRIOS),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(date_spec)
def test_fuzzed_date_exprs_match_duckdb(spark, duck, s):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
        F.col("o_orderpriority") == s["prio"]
    )
    cols = [F.col("o_orderkey")] + [
        _DATE_EXPRS[n][0]().alias(n) for n in s["date_exprs"]
    ]
    sdf = o.select(*cols)
    sel = ", ".join(f"{_DATE_EXPRS[n][1]} AS {n}" for n in s["date_exprs"])
    sql = (
        f"SELECT o_orderkey, {sel} FROM orders "
        f"WHERE o_orderpriority = '{s['prio']}'"
    )
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:2], drows[:2])


# ------------------------------------------------------------- set ops
# Two deterministic projections of customer (overlapping slices) run
# through a fuzzed set operation; DISTINCT variants sort-compare, ALL
# variants compare as multisets (sorted lists). Spark's subtract/
# intersect are DISTINCT semantics — matched to EXCEPT/INTERSECT;
# exceptAll/intersectAll to the ALL forms.
setop_spec = st.fixed_dictionaries(
    {
        "op": st.sampled_from(
            ["union", "union_all", "intersect", "except_", "intersect_all", "except_all"]
        ),
        "amod": st.sampled_from([2, 3]),
        "bmod": st.sampled_from([2, 5]),
        "cols": st.sampled_from(
            [("c_mktsegment",), ("c_nationkey", "c_mktsegment")]
        ),
    }
)


@settings(
    max_examples=18,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(setop_spec)
def test_fuzzed_setops_match_duckdb(spark, duck, s):
    cols = list(s["cols"])
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    a = cust.filter(F.col("c_custkey") % s["amod"] == 0).select(*cols)
    b = cust.filter(F.col("c_custkey") % s["bmod"] == 1).select(*cols)
    csel = ", ".join(cols)
    qa = f"SELECT {csel} FROM customer WHERE c_custkey % {s['amod']} = 0"
    qb = f"SELECT {csel} FROM customer WHERE c_custkey % {s['bmod']} = 1"
    if s["op"] == "union":
        sdf, sql = a.union(b).distinct(), f"({qa}) UNION ({qb})"
    elif s["op"] == "union_all":
        sdf, sql = a.unionAll(b), f"({qa}) UNION ALL ({qb})"
    elif s["op"] == "intersect":
        sdf, sql = a.intersect(b), f"({qa}) INTERSECT ({qb})"
    elif s["op"] == "except_":
        sdf, sql = a.subtract(b), f"({qa}) EXCEPT ({qb})"
    elif s["op"] == "intersect_all":
        sdf, sql = a.intersectAll(b), f"({qa}) INTERSECT ALL ({qb})"
    else:
        sdf, sql = a.exceptAll(b), f"({qa}) EXCEPT ALL ({qb})"
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, (s, srows[:3], drows[:3])
