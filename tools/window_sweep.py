#!/usr/bin/env python3
"""Window-function differential sweep (r18, VERDICT r17 next-round #3).

The r17 sweeps covered scalars (560 exprs) and aggregates (132 calls)
but not the window surface — lead/lag defaults and IGNORE NULLS edges,
ntile remainder distribution, cume_dist/percent_rank tie handling,
RANGE bounds over numeric and DATE keys, default-frame tie semantics.
The reference delegates all of it verbatim to the engine
(/root/reference/src/query_orchestrator.py:351) and its functional
corpus leans on LAG/ROW_NUMBER/PERCENT_RANK/rolling frames
(tests/functional/sync_action_execution_plan/.../config.json:37-72).

Probe shape: each windowed query folds to ONE deterministic scalar —
    SELECT string_agg(coalesce(CAST(w AS VARCHAR), 'N'), ',' ORDER BY id)
    FROM (SELECT id, <call> OVER (<spec>) AS w FROM <VALUES rel>) q
so the whole per-row window output compares as a single value through
the scalar-sweep harness (graft.tools.FunctionSweep expression mode,
exactly like tools/aggregate_sweep.py). Fractional outputs round to 6
digits inside the query so both legs render identically.

Usage: python3 tools/window_sweep.py [outJson]   (from the repo root)
"""
import json
import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from function_sweep import ADD_OPENS, CP, norm, norm_spark  # noqa: E402

# typed relations: ids dense, values with NULLs + ties + two partitions;
# a tie-heavy one for rank family edges; a DATE-keyed one for RANGE
RELS = {
    "w": "(VALUES (1, 10, 'a'), (2, NULL, 'a'), (3, 30, 'b'), (4, 30, 'b'),"
         " (5, 50, 'a'), (6, NULL, 'b'), (7, 10, 'a'), (8, 20, 'a'))"
         " t(id, x, p)",
    "wt": "(VALUES (1, 10), (2, 10), (3, 20), (4, 20), (5, 20), (6, 30),"
          " (7, 30), (8, 40), (9, 40), (10, 50)) t(id, x)",
    "wd": "(VALUES (1, DATE '2020-01-01', 5), (2, DATE '2020-01-02', 7),"
          " (3, DATE '2020-01-02', 1), (4, DATE '2020-01-05', 9),"
          " (5, DATE '2020-01-09', 2), (6, DATE '2020-01-10', 4))"
          " t(id, d, x)",
}

SPECS_ORDERED = [  # for functions requiring ORDER BY (x-keyed: ties+NULLs)
    "ORDER BY x", "ORDER BY x, id", "ORDER BY x DESC",
    "ORDER BY x NULLS FIRST", "ORDER BY x DESC NULLS LAST",
    "PARTITION BY p ORDER BY x",
]
SPECS_SEQ = ["ORDER BY id", "PARTITION BY p ORDER BY id"]
SPECS_FRAMES = [
    "ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "ORDER BY id ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING",
    "ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    "ORDER BY x RANGE BETWEEN 10 PRECEDING AND CURRENT ROW",
    "ORDER BY x RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING",
    "ORDER BY x DESC RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING",
]
SPECS_DATE = [
    "ORDER BY d RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW",
    "ORDER BY d RANGE BETWEEN CURRENT ROW AND INTERVAL 3 DAY FOLLOWING",
    "ORDER BY d RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND"
    " INTERVAL 1 DAY FOLLOWING",
]

# (call, fractional?, relations, specs)
PROBES = []
for call in ["row_number()", "rank()", "dense_rank()"]:
    PROBES.append((call, False, ["w", "wt"], SPECS_ORDERED))
for call in ["percent_rank()", "cume_dist()"]:
    PROBES.append((call, True, ["w", "wt"], SPECS_ORDERED))
for call in ["ntile(1)", "ntile(3)", "ntile(4)", "ntile(7)", "ntile(15)"]:
    PROBES.append((call, False, ["w", "wt"],
                   ["ORDER BY id", "ORDER BY x", "PARTITION BY p ORDER BY x"]))
for call in ["lag(x)", "lag(x, 2)", "lag(x, 2, -1)", "lag(x, 0)",
             "lag(x, -1)", "lead(x)", "lead(x, 3, -1)", "lead(x, -2)",
             "lag(x IGNORE NULLS)", "lead(x IGNORE NULLS)",
             "lag(x, 2 IGNORE NULLS)"]:
    PROBES.append((call, False, ["w"], SPECS_SEQ))
for call in ["first_value(x)", "last_value(x)", "nth_value(x, 2)",
             "nth_value(x, 1)", "first_value(x IGNORE NULLS)",
             "last_value(x IGNORE NULLS)", "nth_value(x, 2 IGNORE NULLS)"]:
    PROBES.append((call, False, ["w"], SPECS_SEQ + SPECS_FRAMES))
for call in ["sum(x)", "count(x)", "count(*)", "min(x)", "max(x)"]:
    PROBES.append((call, False, ["w", "wt"],
                   ["", "ORDER BY x", "ORDER BY id"] + SPECS_FRAMES))
for call in ["avg(x)", "stddev(x)", "var_pop(x)", "median(x)"]:
    PROBES.append((call, True, ["w"], ["", "ORDER BY x", "ORDER BY id",
                                       SPECS_FRAMES[0], SPECS_FRAMES[4]]))
for call in ["sum(x)", "count(*)", "first_value(x)", "avg(x)"]:
    PROBES.append((call, call == "avg(x)", ["wd"], SPECS_DATE))
# adversarial edges: default-frame ties for value functions, rank
# functions with NO order (DuckDB: insertion order; here: loud), odd
# nth offsets, inverted/empty frames, short-form frames, EXCLUDE and
# GROUPS (FrameSql's rewrites), windowed aggregate FILTER
for call in ["first_value(x)", "last_value(x)", "nth_value(x, 2)"]:
    PROBES.append((call, False, ["w", "wt"],
                   ["ORDER BY x", "ORDER BY x DESC NULLS FIRST"]))
for call in ["row_number()", "rank()", "ntile(3)", "lag(x)",
             "first_value(x)"]:
    PROBES.append((call, False, ["w"], ["", "PARTITION BY p"]))
PROBES.append(("nth_value(x, 5)", False, ["w"], ["ORDER BY id"]))
PROBES.append(("lag(x, 10)", False, ["w"], ["ORDER BY id"]))
PROBES.append(("lead(x, 10, 99)", False, ["w"], ["ORDER BY id"]))
for call in ["sum(x)", "count(*)", "avg(x)"]:
    PROBES.append((call, call == "avg(x)", ["w", "wt"], [
        "ORDER BY id ROWS BETWEEN 3 FOLLOWING AND 1 FOLLOWING",
        "ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING",
        "ORDER BY id ROWS 3 PRECEDING",
        "ORDER BY id ROWS UNBOUNDED PRECEDING",
        "ORDER BY x RANGE UNBOUNDED PRECEDING",
        "ORDER BY id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING"
        " EXCLUDE CURRENT ROW",
        "ORDER BY x RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING"
        " EXCLUDE CURRENT ROW",
        "ORDER BY x GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW",
    ]))
PROBES.append(("sum(x) FILTER (WHERE x > 10)", False, ["w", "wt"],
               ["ORDER BY id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
                "ORDER BY id"]))
PROBES.append(("count(x) FILTER (WHERE x IS NOT NULL)", False, ["w"],
               ["ORDER BY id"]))

# probes DuckDB accepts but this engine REJECTS loudly, with the reason
EXPLAINED_ERRORS = {
    "OVER ()-no-order-rank": (
        "ranking/offset functions OVER () or without ORDER BY take "
        "DuckDB's insertion order — undefined in a distributed engine; "
        "rejected loudly (REQUIRES_ORDER_BY) instead of a silent "
        "nondeterministic answer"),
    "inverted-frame": (
        "statically inverted frame bounds (start > end): every row's "
        "frame is empty — DuckDB answers the empty-aggregate value "
        "(NULL / 0) per row; the planner here rejects the frame loudly "
        "(SPECIFIED_WINDOW_FRAME_WRONG_COMPARISON names the exact "
        "problem) — write the empty-frame constant directly"),
}
# value diffs with a recorded explanation (kept zero-unexplained)
EXPLAINED = {}


def build(call, spec, rel, frac):
    over = f"OVER ({spec})" if spec else "OVER ()"
    w = "round(w, 6)" if frac else "w"
    return (
        f"SELECT string_agg(coalesce(CAST({w} AS VARCHAR), 'N'), ','"
        f" ORDER BY id) AS v"
        f" FROM (SELECT id, {call} {over} AS w FROM {RELS[rel]}) q")


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_WIN_r18.json"
    con = duckdb.connect()
    stmts = {}  # sql -> (duck value, meta)
    for call, frac, rels, specs in PROBES:
        for rel in rels:
            for spec in specs:
                if "p," not in RELS[rel] and " p)" not in RELS[rel] \
                        and "PARTITION BY p" in spec:
                    continue
                sql = build(call, spec, rel, frac)
                try:
                    v = con.execute(sql).fetchone()[0]
                except Exception:
                    continue  # not a v1.0 shape
                stmts[sql] = (norm(v), f"{call} | {spec or '()'} | {rel}")

    with open("/tmp/win_exprs.txt", "w") as f:
        f.write("\n".join(f"SELECT v FROM ({s})" for s in stmts))
    spark_raw = subprocess.run(
        ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", CP,
         "graft.tools.FunctionSweep", "/tmp/win_exprs.txt",
         "/tmp/win_spark.json"],
        capture_output=True, text=True)
    if spark_raw.returncode != 0:
        sys.exit(f"spark leg failed:\n{spark_raw.stderr[-2000:]}")
    with open("/tmp/win_spark.json") as f:
        spark = json.load(f)

    diffs, errors, matched = [], [], 0
    for sql, (dv, meta) in stmts.items():
        wrapped = f"SELECT v FROM ({sql})"
        sv = spark.get(wrapped)
        if sv is None or "error" in sv:
            errors.append({"probe": meta, "expr": sql, "duck": dv,
                           "spark_error": (sv or {}).get(
                               "error", "missing")[:300]})
        elif norm_spark(sv["value"]) == dv:
            matched += 1
        else:
            diffs.append({"probe": meta, "expr": sql, "duck": dv,
                          "spark": norm_spark(sv["value"])})

    for d in diffs:
        for key, why in EXPLAINED.items():
            if key in d["probe"]:
                d["explained"] = why
    for e in errors:
        call, spec, _ = (s.strip() for s in e["probe"].split("|"))
        fn = call.split("(")[0]
        if fn in ("row_number", "rank", "dense_rank", "percent_rank",
                  "cume_dist", "ntile", "lag", "lead", "first_value",
                  "last_value", "nth_value") and "ORDER BY" not in spec:
            e["explained"] = EXPLAINED_ERRORS["OVER ()-no-order-rank"]
        elif "BETWEEN 3 FOLLOWING AND 1 FOLLOWING" in spec and \
                "WRONG_COMPARISON" in e["spark_error"]:
            e["explained"] = EXPLAINED_ERRORS["inverted-frame"]

    unexplained = [x for x in diffs + errors if "explained" not in x]
    result = {"checked": len(stmts), "matched": matched,
              "unexplained": len(unexplained),
              "value_diffs": diffs, "spark_errors": errors}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, default=str)
    print(f"checked {len(stmts)} window probes: {matched} matched, "
          f"{len(diffs)} value diffs, {len(errors)} spark errors, "
          f"{len(unexplained)} UNEXPLAINED -> {out_json}")


if __name__ == "__main__":
    main()
