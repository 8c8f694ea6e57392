#!/usr/bin/env python3
"""Query-CLAUSE differential sweep (r18 — the expression sweeps' sibling
for STATEMENT-SHAPE semantics).

The r17/r18 sweeps covered scalar functions, aggregate calls and the
window surface; this one probes the clause grammar the reference
delegates verbatim: set-operation dedup/typing/precedence, GROUP BY
ROLLUP/CUBE/GROUPING SETS null markers and GROUPING() bits, HAVING
scoping, VALUES/ORDER BY/LIMIT/OFFSET edges, three-valued IN/NOT
IN/EXISTS subquery semantics, CASE null handling, CTE shadowing.

Probe shape: every probe is a full SELECT folded to ONE deterministic
scalar — multi-row results fold through
    string_agg(<row string>, ';' ORDER BY <row string>)
so whole result relations compare as single values through the scalar
harness (graft.tools.FunctionSweep expression mode).

Usage: python3 tools/clause_sweep.py [outJson]   (from the repo root)
"""
import json
import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from function_sweep import ADD_OPENS, CP, norm, norm_spark  # noqa: E402


def fold(cols, body):
    """Fold a multi-row SELECT into one canonical string scalar."""
    row = "concat_ws('|', " + ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), 'N')" for c in cols) + ")"
    return (f"SELECT string_agg(r, ';' ORDER BY r) AS v FROM"
            f" (SELECT {row} AS r FROM ({body}) q) z")


T = "(VALUES ('a', 'x', 1), ('a', 'y', 2), ('b', 'x', 3), ('b', 'x', 4)," \
    " ('c', NULL, 5)) t(g, p, x)"
N = "(VALUES (1), (2), (2), (3), (NULL)) n(v)"
M = "(VALUES (2), (2), (4), (NULL)) m(v)"

PROBES = []  # (label, sql)


def add(label, cols, body):
    PROBES.append((label, fold(cols, body)))


def add_scalar(label, sql):
    # each scalar probe is an EXPRESSION body after SELECT — alias it so
    # the harness's `SELECT v FROM (...)` wrapper resolves
    assert sql.startswith("SELECT ")
    PROBES.append((label, "SELECT (" + sql[len("SELECT "):] + ") AS v"))


# ── set operations ──────────────────────────────────────────────────
add("union-dedup", ["v"], f"SELECT v FROM {N} UNION SELECT v FROM {M}")
add("union-all", ["v"], f"SELECT v FROM {N} UNION ALL SELECT v FROM {M}")
add("intersect-dedup", ["v"], f"SELECT v FROM {N} INTERSECT SELECT v FROM {M}")
add("intersect-all-bag", ["v"],
    f"SELECT v FROM {N} INTERSECT ALL SELECT v FROM {M}")
add("except-dedup", ["v"], f"SELECT v FROM {N} EXCEPT SELECT v FROM {M}")
add("except-all-bag", ["v"], f"SELECT v FROM {N} EXCEPT ALL SELECT v FROM {M}")
add("union-null-dedup", ["v"],
    "SELECT NULL AS v UNION SELECT NULL UNION SELECT 1")
add("setop-precedence-intersect-binds-tighter", ["v"],
    f"SELECT v FROM {N} UNION SELECT v FROM {M} INTERSECT SELECT 2 AS v")
add("setop-left-assoc-except", ["v"],
    f"SELECT v FROM {N} EXCEPT SELECT 2 AS v EXCEPT SELECT 3 AS v")
add("union-int-decimal-coercion", ["v"],
    "SELECT 1 AS v UNION ALL SELECT 2.5")
add("union-int-double-coercion", ["v"],
    "SELECT 1 AS v UNION ALL SELECT 2.5e0")
add("union-order-by-whole", ["v"],
    f"SELECT * FROM (SELECT v FROM {N} UNION SELECT v FROM {M}"
    f" ORDER BY v NULLS FIRST LIMIT 3) s")
add("union-date-string", ["v"],
    "SELECT DATE '2020-01-02' AS v UNION ALL SELECT '2020-01-03'")

# ── GROUP BY extensions ─────────────────────────────────────────────
add("rollup-1col", ["g", "s"],
    f"SELECT g, sum(x) AS s FROM {T} GROUP BY ROLLUP(g)")
add("rollup-2col", ["g", "p", "s"],
    f"SELECT g, p, sum(x) AS s FROM {T} GROUP BY ROLLUP(g, p)")
add("cube-2col", ["g", "p", "s"],
    f"SELECT g, p, sum(x) AS s FROM {T} GROUP BY CUBE(g, p)")
add("grouping-sets", ["g", "p", "s"],
    f"SELECT g, p, sum(x) AS s FROM {T}"
    " GROUP BY GROUPING SETS ((g), (p), ())")
add("grouping-bits", ["g", "p", "s", "gr"],
    f"SELECT g, p, sum(x) AS s, GROUPING(g, p) AS gr FROM {T}"
    " GROUP BY CUBE(g, p)")
add("grouping-single-bit", ["g", "s", "gr"],
    f"SELECT g, sum(x) AS s, GROUPING(g) AS gr FROM {T} GROUP BY ROLLUP(g)")
add("partial-rollup", ["g", "p", "s"],
    f"SELECT g, p, sum(x) AS s FROM {T} GROUP BY g, ROLLUP(p)")
add("rollup-null-data-vs-marker", ["p", "s", "gr"],
    f"SELECT p, sum(x) AS s, GROUPING(p) AS gr FROM {T} GROUP BY ROLLUP(p)")
add("rollup-having", ["g", "s"],
    f"SELECT g, sum(x) AS s FROM {T} GROUP BY ROLLUP(g) HAVING sum(x) > 4")
add("group-by-expr", ["e", "s"],
    f"SELECT x % 2 AS e, sum(x) AS s FROM {T} GROUP BY x % 2")
add("group-by-ordinal", ["g", "s"],
    f"SELECT g, sum(x) AS s FROM {T} GROUP BY 1")
add("having-without-select-agg", ["g"],
    f"SELECT g FROM {T} GROUP BY g HAVING count(*) > 1")
add("count-star-vs-col-nulls", ["cs", "cp"],
    f"SELECT count(*) AS cs, count(p) AS cp FROM {T}")

# ── DISTINCT / ORDER BY / LIMIT ─────────────────────────────────────
add("distinct-multi-null", ["g", "p"], f"SELECT DISTINCT g, p FROM {T}")
add("order-by-ordinal-desc", ["g", "x"],
    f"SELECT * FROM (SELECT g, x FROM {T} ORDER BY 2 DESC LIMIT 2) s")
add("limit-offset", ["x"],
    f"SELECT * FROM (SELECT x FROM {T} ORDER BY x LIMIT 2 OFFSET 2) s")
add("offset-past-end", ["x"],
    f"SELECT * FROM (SELECT x FROM {T} ORDER BY x LIMIT 5 OFFSET 99) s")
add("limit-zero", ["x"], f"SELECT * FROM (SELECT x FROM {T} LIMIT 0) s")
add_scalar("order-by-alias",
           f"SELECT (SELECT string_agg(CAST(d AS VARCHAR), ',' ORDER BY d)"
           f" FROM (SELECT x * 2 AS d FROM {T} ORDER BY d) s)")

# ── subquery three-valued logic ─────────────────────────────────────
add_scalar("in-with-null-hit", "SELECT 2 IN (SELECT v FROM " + M + ")")
add_scalar("in-with-null-miss", "SELECT 3 IN (SELECT v FROM " + M + ")")
add_scalar("not-in-with-null", "SELECT 3 NOT IN (SELECT v FROM " + M + ")")
add_scalar("null-in-list", "SELECT NULL IN (SELECT v FROM " + M + ")")
add_scalar("in-values-null", "SELECT 1 IN (2, NULL)")
add_scalar("not-in-values-null", "SELECT 1 NOT IN (2, NULL)")
add_scalar("exists-empty",
           f"SELECT EXISTS (SELECT 1 FROM {N} WHERE v > 99)")
add_scalar("not-exists-null-rows",
           f"SELECT NOT EXISTS (SELECT 1 FROM {M} WHERE v IS NULL)")
add("correlated-scalar-subquery", ["g", "mx"],
    f"SELECT g, (SELECT max(x) FROM (SELECT * FROM {T}) i WHERE i.g = o.g)"
    f" AS mx FROM (SELECT * FROM {T}) o")
add_scalar("scalar-subquery-empty-is-null",
           f"SELECT (SELECT v FROM {N} WHERE v > 99) IS NULL")
add_scalar("any-comparison", f"SELECT 2 = ANY (SELECT v FROM {M})")
add_scalar("all-comparison-null",
           f"SELECT 5 > ALL (SELECT v FROM {M})")
add_scalar("all-comparison-true",
           f"SELECT 5 > ALL (SELECT v FROM {M} WHERE v IS NOT NULL)")

# ── CASE / COALESCE / boolean edges ─────────────────────────────────
add_scalar("simple-case-null-subject",
           "SELECT CASE NULL WHEN NULL THEN 'eq' ELSE 'ne' END")
add_scalar("searched-case-null-cond",
           "SELECT CASE WHEN NULL THEN 'y' ELSE 'n' END")
add_scalar("if-null-cond", "SELECT IF(NULL, 'y', 'n')")
add("where-null-filters-all", ["v"],
    "SELECT v FROM (VALUES (1), (2)) t(v) WHERE NULL")
add_scalar("case-no-else-no-match", "SELECT CASE 5 WHEN 1 THEN 'a' END")
add_scalar("bool-and-null", "SELECT (true AND NULL) IS NULL")
add_scalar("bool-or-null", "SELECT (false OR NULL) IS NULL")
add_scalar("not-null", "SELECT (NOT NULL) IS NULL")
add_scalar("null-eq-null", "SELECT (NULL = NULL) IS NULL")
add_scalar("distinct-from", "SELECT NULL IS DISTINCT FROM NULL")
add_scalar("not-distinct-from", "SELECT 1 IS NOT DISTINCT FROM NULL")
add_scalar("between-null", "SELECT (5 BETWEEN NULL AND 10) IS NULL")

# ── VALUES / CTE shapes ─────────────────────────────────────────────
add("values-coercion", ["v"], "SELECT * FROM (VALUES (1), (2.5)) t(v)")
add("values-null-first-row", ["a", "b"],
    "SELECT * FROM (VALUES (NULL, 1), (2, NULL)) t(a, b)")
add("cte-shadows-cte", ["v"],
    "WITH a AS (SELECT 1 AS v), b AS (SELECT v + 1 AS v FROM a)"
    " SELECT v FROM b")
add("nested-with-in-subquery", ["v"],
    "SELECT * FROM (WITH i AS (SELECT 2 AS v) SELECT v FROM i) s")
add("cte-used-twice", ["s"],
    f"WITH c AS (SELECT x FROM {T}) SELECT (SELECT sum(x) FROM c) +"
    " (SELECT count(*) FROM c) AS s FROM (VALUES (1)) one")

# value diffs with a recorded explanation
EXPLAINED = {}
# loud-error boundaries
EXPLAINED_ERRORS = {}


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_CLAUSE_r18.json"
    con = duckdb.connect()
    stmts = {}
    for label, sql in PROBES:
        try:
            v = con.execute(sql).fetchone()[0]
        except Exception as e:
            print(f"[duck-reject] {label}: {str(e).splitlines()[0][:100]}")
            continue
        stmts[sql] = (norm(v), label)

    with open("/tmp/clause_exprs.txt", "w") as f:
        f.write("\n".join(f"SELECT v FROM ({s})"
                          for s in stmts))
    spark_raw = subprocess.run(
        ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", CP,
         "graft.tools.FunctionSweep", "/tmp/clause_exprs.txt",
         "/tmp/clause_spark.json"],
        capture_output=True, text=True)
    if spark_raw.returncode != 0:
        sys.exit(f"spark leg failed:\n{spark_raw.stderr[-2000:]}")
    with open("/tmp/clause_spark.json") as f:
        spark = json.load(f)

    diffs, errors, matched = [], [], 0
    for sql, (dv, label) in stmts.items():
        wrapped = f"SELECT v FROM ({sql})"
        sv = spark.get(wrapped)
        if sv is None or "error" in sv:
            e = {"probe": label, "expr": sql, "duck": dv,
                 "spark_error": (sv or {}).get("error", "missing")[:300]}
            if label in EXPLAINED_ERRORS:
                e["explained"] = EXPLAINED_ERRORS[label]
            errors.append(e)
        elif norm_spark(sv["value"]) == dv:
            matched += 1
        else:
            x = {"probe": label, "expr": sql, "duck": dv,
                 "spark": norm_spark(sv["value"])}
            if label in EXPLAINED:
                x["explained"] = EXPLAINED[label]
            diffs.append(x)

    unexplained = [x for x in diffs + errors if "explained" not in x]
    result = {"checked": len(stmts), "matched": matched,
              "unexplained": len(unexplained),
              "value_diffs": diffs, "spark_errors": errors}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, default=str)
    print(f"checked {len(stmts)} clause probes: {matched} matched, "
          f"{len(diffs)} value diffs, {len(errors)} spark errors, "
          f"{len(unexplained)} UNEXPLAINED -> {out_json}")


if __name__ == "__main__":
    main()
