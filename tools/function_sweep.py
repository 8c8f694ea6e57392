#!/usr/bin/env python3
"""Systematic function-semantics differential sweep (r17, VERDICT r16 #5).

r16 caught log() (1-arg = log10 in DuckDB, ln in Spark) and substring's
negative-start window BY HAND. This sweep makes that class systematic:

1. `java ... graft.tools.FunctionSweep --names` dumps every name the
   engine registers (DuckFunctions + extension registry).
2. For each name that DuckDB v1.0 also exposes as a SCALAR function,
   duckdb_functions() supplies the parameter types of each overload;
   a small literal grid per type builds concrete call expressions.
3. Each expression runs in DuckDB; the ones DuckDB accepts (the
   user-reachable shapes) then run through the engine's own statement
   path (Dialect.rewrite → spark.sql) via FunctionSweep <exprs> <out>.
4. Values compare with the gate's normalization (floats to 10
   significant digits, rows stringified). Diffs land in SWEEP_r17.json:
   each is either a real divergence to fix, or gets a recorded
   explanation (EXPLAINED below keeps the ledger zero-unexplained).

Usage: python3 tools/function_sweep.py [outJson]
"""
import json
import math
import subprocess
import sys

import duckdb

ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"]]
CP = "target/scala-2.13/classes:/opt/spark/jars/*"

# literal grid per DuckDB parameter type — small, deterministic, chosen
# to hit sign/fraction/empty/multibyte edges
GRID = {
    "BIGINT": ["7", "-3", "0"],
    "INTEGER": ["7", "-3"],
    "DOUBLE": ["2.5", "-0.5"],
    "FLOAT": ["2.5"],
    "DECIMAL": ["1.25"],
    "VARCHAR": ["'aBc'", "''", "'héllo wörld'"],
    "BOOLEAN": ["true"],
    "DATE": ["DATE '2020-03-15'"],
    "TIMESTAMP": ["TIMESTAMP '2020-03-15 13:45:30'"],
    "TIMESTAMP WITH TIME ZONE": ["TIMESTAMP '2020-03-15 13:45:30'"],
    "TIME": ["TIME '13:45:30'"],
    "INTERVAL": ["INTERVAL 2 DAY"],
    "BIGINT[]": ["[3, 1, 2]"],
    "DOUBLE[]": ["[1.5, 2.5]"],
    "VARCHAR[]": ["['b', 'a']"],
    "ANY": ["7", "'aBc'"],
    "ANY[]": ["[3, 1, 2]"],
    "UBIGINT": ["7"],
    "UINTEGER": ["7"],
    "HUGEINT": ["7"],
    "TINYINT": ["7"],
    "SMALLINT": ["7"],
    "BLOB": ["'ab'::BLOB"],
    "JSON": ["'{\"a\": 1}'"],
    "MAP(ANY, ANY)": ["MAP {'k': 1}"],
}

# functions whose OUTPUT is legitimately engine-specific or
# environment-bound — skipped with the reason on the ledger
SKIP = {
    "random": "nondeterministic by contract",
    "uuid": "nondeterministic by contract",
    "gen_random_uuid": "nondeterministic by contract",
    "uuidv4": "nondeterministic by contract",
    "uuidv7": "nondeterministic by contract (time-ordered)",
    "now": "wall clock", "get_current_timestamp": "wall clock",
    "current_date": "wall clock", "today": "wall clock",
    "get_current_time": "wall clock",
    "current_localtime": "wall clock", "current_localtimestamp": "wall clock",
    "transaction_timestamp": "wall clock",
    "version": "engine identity by design",
    "current_schema": "catalog identity", "current_schemas": "catalog identity",
    "current_database": "catalog identity", "current_catalog": "catalog identity",
    "current_user": "catalog identity", "user": "catalog identity",
    "session_user": "catalog identity",
    "current_query": "reflects the querying engine's own text",
    "txid_current": "engine transaction counter",
    "pg_backend_pid": "process identity",
    "nextval": "stateful sequence", "currval": "stateful sequence",
    "checkpoint": "storage side effect", "force_checkpoint": "storage side effect",
    "database_size": "storage introspection",
    "get_memory_limit": "environment introspection",
    "get_block_size": "storage introspection",
    "icu_sort_key": "collation table identity",
    "stats": "optimizer introspection string",
    "enum_range": "needs enum argument (typed-grid outside scope; spec-pinned)",
    "enum_first": "needs enum argument", "enum_last": "needs enum argument",
    "enum_code": "needs enum argument",
    "enum_range_boundary": "needs enum argument",
}

# diff explanations recorded in prior rounds or this one — each entry is
# (function, reason). A diff with an explanation is not "unexplained".
EXPLAINED = {
    "list_distinct": "DuckDB returns hash order, Spark first-seen order — "
                     "the set is equal; element order of DISTINCT is not a "
                     "contract in either engine",
    "make_date": "negative/zero years agree as proleptic values; DuckDB "
                 "renders the (BC) era suffix, Spark prints the bare "
                 "proleptic date — rendering only",
    "repeat": "BLOB repeat: equal bytes; DuckDB renders BLOBs hex, the "
              "Spark leg's binary→string view prints them raw — rendering",
    "factorial": "factorial(n>20) is HUGEINT in DuckDB, NULL here (long "
                 "overflow contract) — n≤20 and negatives match",
}

# loud-error boundaries: the engine REJECTS these shapes with a named
# remediation where DuckDB accepts them — recorded, not silent
EXPLAINED_ERRORS = {
    "parse_dirname": "invalid separator token rejected loudly with the "
                     "valid set named (DuckDB silently ignores it)",
    "parse_dirpath": "invalid separator token rejected loudly",
    "parse_filename": "invalid separator token rejected loudly",
    "parse_path": "invalid separator token rejected loudly",
    "strftime": "non-literal format strings rejected loudly (codegen'd "
                "literal formats by design)",
    "age": "unbound — DuckDB's age() is Postgres calendar decomposition "
           "(years/months/days mixed units) with no Spark twin; the "
           "1-arg form is wall-clock-dependent besides",
}


def iso_duration_secs(s):
    """ISO-8601 duration (Spark's interval rendering) -> seconds, using
    DuckDB's own 30-day-month convention so both legs normalize alike."""
    import re
    m = re.fullmatch(
        r"([+-]?)P(?:(-?\d+)Y)?(?:(-?\d+)M)?(?:(-?\d+)D)?"
        r"(?:T(?:(-?\d+)H)?(?:(-?\d+)M)?(?:(-?\d+(?:\.\d+)?)S)?)?", s)
    if not m or s in ("P", "PT"):
        return None
    sign = -1 if m.group(1) == "-" else 1
    y, mo, d, h, mi, se = (float(g) if g else 0.0 for g in m.groups()[1:])
    return sign * ((y * 12 + mo) * 2592000 + d * 86400 +
                   h * 3600 + mi * 60 + se)


def norm(v):
    import datetime
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.timedelta):
        return f"{v.total_seconds():.10g}"
    if isinstance(v, datetime.datetime):
        # match the Spark leg's rendering: UTC-naive, space-separated,
        # trailing fractional zeros trimmed
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        s = v.isoformat(sep=" ")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return f"{v:.10g}"
    if isinstance(v, list):
        return [norm(x) for x in v]
    if isinstance(v, dict):
        # python-duckdb renders MAP values as {'key': [...], 'value': [...]}
        # — normalize to a plain key→value dict like the Spark leg
        if set(v.keys()) == {"key", "value"} and \
                isinstance(v["key"], list) and isinstance(v["value"], list):
            return {str(k): norm(x) for k, x in
                    sorted(zip(v["key"], v["value"]), key=lambda p: str(p[0]))}
        return {k: norm(x) for k, x in sorted(v.items())}
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SWEEP_r17.json"
    names_raw = subprocess.run(
        ["java", *ADD_OPENS, "-Xmx4g", "-Dspark.ui.enabled=false",
         "-cp", CP, "graft.tools.FunctionSweep", "--names"],
        capture_output=True, text=True, check=True).stdout
    names = json.loads([l for l in names_raw.splitlines()
                        if l.startswith("[")][-1])
    con = duckdb.connect()
    sigs = con.execute(
        "SELECT function_name, parameters, parameter_types FROM duckdb_functions() "
        "WHERE function_type = 'scalar'").fetchall()
    by_name = {}
    for fn, params, ptypes in sigs:
        by_name.setdefault(fn.lower(), []).append(ptypes)

    exprs, skipped = [], []
    for name in sorted(set(n.lower() for n in names)):
        if name in SKIP:
            skipped.append({"fn": name, "reason": SKIP[name]})
            continue
        overloads = by_name.get(name)
        if not overloads:
            skipped.append({"fn": name, "reason": "not a DuckDB v1.0 scalar "
                            "(table fn / >=1.4 floor / graft-internal)"})
            continue
        made = 0
        for ptypes in overloads[:3]:  # at most 3 overloads per name
            def lits(t):
                t = t.upper()
                if t in GRID:
                    return GRID[t]
                if t.endswith("[]"):
                    return GRID.get(t, GRID["ANY[]"])
                if t.startswith("DECIMAL"):
                    return GRID["DECIMAL"]
                return None
            grids = [lits(t) for t in ptypes]
            if any(g is None for g in grids) or len(ptypes) > 3:
                continue
            # first-literal tuple plus per-arg variations of the first slot
            combos = [[g[0] for g in grids]]
            if grids:
                for alt in grids[0][1:]:
                    combos.append([alt] + [g[0] for g in grids[1:]])
            for c in combos:
                exprs.append(f"{name}({', '.join(c)})")
            made += 1
        if not made:
            skipped.append({"fn": name, "reason": "no literal grid for its "
                            "signature types"})

    # DuckDB leg: keep expressions DuckDB accepts, record value
    duck = {}
    for e in exprs:
        try:
            duck[e] = norm(con.execute(f"SELECT {e}").fetchone()[0])
        except Exception:
            pass  # not a v1.0-reachable shape with these literals

    with open("/tmp/sweep_exprs.txt", "w") as f:
        f.write("\n".join(duck.keys()))
    spark_raw = subprocess.run(
        ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
         "-Dspark.sql.session.timeZone=UTC", "-cp", CP,
         "graft.tools.FunctionSweep", "/tmp/sweep_exprs.txt",
         "/tmp/sweep_spark.json"],
        capture_output=True, text=True)
    if spark_raw.returncode != 0:
        sys.exit(f"spark leg failed:\n{spark_raw.stderr[-2000:]}")
    with open("/tmp/sweep_spark.json") as f:
        spark = json.load(f)

    diffs, errors, matched = [], [], 0
    for e, dv in duck.items():
        fn = e.split("(")[0]
        sv = spark.get(e)
        if sv is None or "error" in sv:
            err = {"expr": e, "duck": dv,
                   "spark_error": (sv or {}).get("error", "missing")[:200]}
            if fn in EXPLAINED_ERRORS:
                err["explained"] = EXPLAINED_ERRORS[fn]
            errors.append(err)
        elif norm_spark(sv["value"]) == dv:
            matched += 1
        else:
            d = {"expr": e, "duck": dv, "spark": norm_spark(sv["value"])}
            if fn in EXPLAINED:
                d["explained"] = EXPLAINED[fn]
            diffs.append(d)

    unexplained = [x for x in diffs + errors if "explained" not in x]
    result = {"checked": len(duck), "matched": matched,
              "unexplained": len(unexplained),
              "value_diffs": diffs, "spark_errors": errors,
              "skipped": skipped}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, default=str)
    print(f"checked {len(duck)} expressions: {matched} matched, "
          f"{len(diffs)} value diffs, {len(errors)} spark errors, "
          f"{len(unexplained)} UNEXPLAINED "
          f"({len(skipped)} functions skipped) -> {out_json}")


def norm_spark(v):
    # FunctionSweep serializes values as JSON already; normalize the same way
    if isinstance(v, float):
        return norm(v)
    if isinstance(v, list):
        return [norm_spark(x) for x in v]
    if isinstance(v, str) and v[:1] in ("P", "-", "+") and "P" in v[:2]:
        secs = iso_duration_secs(v)
        if secs is not None:
            return f"{secs:.10g}"
    return norm(v) if v is not None else "None"


if __name__ == "__main__":
    main()
