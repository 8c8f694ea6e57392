#!/usr/bin/env python3
"""Aggregate-function differential sweep (r17 — the scalar sweep's
sibling; tools/function_sweep.py covers function_type='scalar' only).

DuckDB's own duckdb_functions() lists the aggregates; each runs over a
set of small typed VALUES relations chosen to expose the classic
divergences (sample-vs-population moments, median interpolation, mode
ties, sum result types, NULL handling, empty-group results). The Spark
leg runs the identical statement through Dialect.rewrite → spark.sql
via graft.tools.FunctionSweep's expression mode (the expressions here
are full SELECTs, which FunctionSweep accepts the same way).

Usage: python3 tools/aggregate_sweep.py [outJson]   (from the repo root)
"""
import json
import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from function_sweep import ADD_OPENS, CP, norm, norm_spark  # noqa: E402

# typed input relations (name -> (column type tag, VALUES sql))
RELATIONS = {
    "ints": "(VALUES (1), (2), (3), (5), (8)) t(x)",
    "ints_null": "(VALUES (1), (NULL), (3), (NULL), (8)) t(x)",
    "dbls": "(VALUES (1.5e0), (2.5e0), (-0.5e0), (4.0e0)) t(x)",
    "dbl_one": "(VALUES (2.5e0)) t(x)",
    "strs": "(VALUES ('b'), ('a'), ('c'), ('a')) t(x)",
    "bools": "(VALUES (true), (true), (false)) t(x)",
    "dates": "(VALUES (DATE '2020-01-01'), (DATE '2020-01-03'), "
             "(DATE '2020-02-11')) t(x)",
    "empty": "(VALUES (1)) t(x) WHERE x < 0",
}

# aggregate name -> list of (relation, call) to try; '{x}' is the column
CALLS = {}


def default_calls(name):
    return [("ints", f"{name}(x)"), ("ints_null", f"{name}(x)"),
            ("dbls", f"{name}(x)"), ("empty", f"{name}(x)"),
            ("strs", f"{name}(x)"), ("bools", f"{name}(x)"),
            ("dates", f"{name}(x)"), ("dbl_one", f"{name}(x)")]


# aggregates whose output is legitimately engine/impl-specific
SKIP = {
    "approx_quantile": "sketch-impl-specific (t-digest vs datasketches); "
                       "bounds spec-pinned",
    "approx_count_distinct": "HLL-impl-specific; error bounds spec-pinned",
    "reservoir_quantile": "sampling-impl-specific; spec-pinned",
    "histogram": "map rendering + bucket policy spec-pinned via q-rows",
    "histogram_exact": "spec-pinned via q-rows",
    "first": "order-dependent without ORDER BY (ordered form is "
             "q-row tested)",
    "last": "order-dependent without ORDER BY",
    "any_value": "order-dependent", "arbitrary": "order-dependent",
    "array_agg": "order-dependent without ORDER BY", "list": "order-dependent",
    "string_agg": "order-dependent without ORDER BY (ordered form "
                  "q-row tested)", "group_concat": "order-dependent",
    "listagg": "order-dependent",
    "mode": "tie order impl-specific on this grid (deterministic ties are "
            "q-row tested)",
    "fsum": "Kahan vs naive only observable past double precision",
    "sumkahan": "same", "kahan_sum": "same",
}

EXPLAINED = {}
EXPLAINED_ERRORS = {
    "mad": "mad over DATE/TIMESTAMP returns an INTERVAL in DuckDB — "
           "unbound here (loud DATATYPE_MISMATCH; numeric mad is fully "
           "mapped and q-row tested)",
}


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_AGG_r17.json"
    con = duckdb.connect()
    aggs = sorted({r[0].lower() for r in con.execute(
        "SELECT function_name FROM duckdb_functions() "
        "WHERE function_type = 'aggregate'").fetchall()})

    stmts, skipped = {}, []
    for name in aggs:
        if name in SKIP:
            skipped.append({"fn": name, "reason": SKIP[name]})
            continue
        for rel, call in CALLS.get(name, default_calls(name)):
            sql = f"SELECT {call} AS v FROM {RELATIONS[rel]}"
            try:
                v = con.execute(sql).fetchone()[0]
            except Exception:
                continue  # not a v1.0 shape for this input type
            stmts[sql] = norm(v)

    with open("/tmp/agg_exprs.txt", "w") as f:
        # FunctionSweep wraps lines as SELECT (<line>) AS v — feed it
        # scalar subqueries so full SELECTs ride the same harness
        f.write("\n".join(f"SELECT v FROM ({s})" for s in stmts))
    spark_raw = subprocess.run(
        ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", CP,
         "graft.tools.FunctionSweep", "/tmp/agg_exprs.txt",
         "/tmp/agg_spark.json"],
        capture_output=True, text=True)
    if spark_raw.returncode != 0:
        sys.exit(f"spark leg failed:\n{spark_raw.stderr[-2000:]}")
    with open("/tmp/agg_spark.json") as f:
        spark = json.load(f)

    diffs, errors, matched = [], [], 0
    for sql, dv in stmts.items():
        wrapped = f"SELECT v FROM ({sql})"
        fn = sql.split("(", 1)[0].replace("SELECT ", "").strip()
        sv = spark.get(wrapped)
        if sv is None or "error" in sv:
            err = {"expr": sql, "duck": dv,
                   "spark_error": (sv or {}).get("error", "missing")[:200]}
            if fn in EXPLAINED_ERRORS:
                err["explained"] = EXPLAINED_ERRORS[fn]
            errors.append(err)
        elif norm_spark(sv["value"]) == dv:
            matched += 1
        else:
            d = {"expr": sql, "duck": dv, "spark": norm_spark(sv["value"])}
            if fn in EXPLAINED:
                d["explained"] = EXPLAINED[fn]
            diffs.append(d)

    unexplained = [x for x in diffs + errors if "explained" not in x]
    result = {"checked": len(stmts), "matched": matched,
              "unexplained": len(unexplained),
              "value_diffs": diffs, "spark_errors": errors,
              "skipped": skipped}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, default=str)
    print(f"checked {len(stmts)} aggregate calls: {matched} matched, "
          f"{len(diffs)} value diffs, {len(errors)} spark errors, "
          f"{len(unexplained)} UNEXPLAINED "
          f"({len(skipped)} skipped) -> {out_json}")


if __name__ == "__main__":
    main()
