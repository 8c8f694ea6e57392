#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify dump (outDir/<name>.parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf-dir parquet tables, sorts columns by
name / rows by all columns, and compares row counts, schemas and values.

Usage: check_correctness.py [sfDir] [outDir] [only] [--json PATH]
  --json PATH also writes a driver-schema result file
  ({"<name>.parquet": {rows_match, schema_match, hash_match, spark_rows,
  oracle_rows, err}}) — committed as CORRECTNESS_local.json each round so
  the gate result is on the ledger even if the driver's own leg fails.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Column-name-sorted, row-sorted, float-normalized value matrix."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.10g}"
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    argv, args, json_out = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        if argv[i] == "--json":
            json_out = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2].split(",")) if len(args) > 2 else None

    with open(f"{out_dir}/oracle_sql.json") as f:
        raw = json.load(f)
    # oracle_sql.json now carries each SQL under both "name" and
    # "name.parquet" (driver keys by file name) — dedupe to bare names here.
    oracles = {k.removesuffix(".parquet"): v for k, v in raw.items()}

    con = duckdb.connect()
    # Emit the oracle engine's version up front and into the JSON: the one
    # r12 ledger red (q73) was driver-oracle DuckDB-version drift, invisible
    # until bisected by hand. With the version on the artifact, local-vs-
    # driver engine drift is diagnosable in one glance.
    oracle_version = con.execute("SELECT version()").fetchone()[0]
    print(f"oracle engine: duckdb {oracle_version}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    record = {}  # "<name>.parquet" -> driver-schema dict

    def rec(name, **kw):
        d = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None}
        d.update(kw)
        record[f"{name}.parquet"] = d

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            tbl = pq.read_table(f"{out_dir}/{name}.parquet")
            s_cols = tbl.column_names
            s_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            rec(name, err=f"spark_unreadable: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            rec(name, spark_rows=len(s_rows), err=f"oracle_sql_error: {e}")
            n_fail += 1
            continue

        sc, sv = canon(s_rows, s_cols)
        dc, dv = canon(d_rows, d_cols)
        base = dict(spark_rows=len(sv), oracle_rows=len(dv))
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            rec(name, schema_match=False, err="columns_differ", **base)
            n_fail += 1
            continue
        # type comparison (FAIL-level since round 6: a HUGEINT/decimal oracle
        # column hashes differently on the driver's stricter DuckDB even when
        # values agree on local 1.0.0 — see VERDICT r5 #1 / t11)
        ARROW2DUCK = {"int64": "BIGINT", "int32": "INTEGER", "int16": "SMALLINT",
                      "double": "DOUBLE", "float": "FLOAT", "string": "VARCHAR",
                      "large_string": "VARCHAR", "bool": "BOOLEAN",
                      "date32[day]": "DATE"}
        try:
            rel = con.sql(sql)
            d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception:
            # introspection failure is not evidence of drift: degrade to the
            # value compare (pre-round-6 behavior) rather than hard-failing
            # every column against an unknown type
            print(f"WARN {name}: duckdb relation introspection failed; type check skipped")
            d_types = None
        type_mismatch = []
        for i, col_name in enumerate(tbl.column_names if d_types is not None else []):
            at = str(tbl.schema.field(col_name).type)
            dt = str(d_types.get(col_name, "?"))
            exp = ARROW2DUCK.get(at)
            if at.startswith("timestamp"):
                exp = "TIMESTAMP"
            elif at.startswith("decimal"):
                exp = "DECIMAL"
            if exp is None:
                continue
            if not dt.startswith(exp):
                type_mismatch.append(f"{col_name} spark={at} duck={dt}")
        if type_mismatch:
            print(f"FAIL {name}: column types differ: {'; '.join(type_mismatch)}")
            rec(name, schema_match=False, err=f"types_differ: {'; '.join(type_mismatch)}",
                **base)
            n_fail += 1
            continue
        if len(sv) != len(dv):
            print(f"FAIL {name}: rows spark={len(sv)} duck={len(dv)}")
            rec(name, rows_match=False, schema_match=True, err="row_count", **base)
            n_fail += 1
            continue
        if sv != dv:
            bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  cols : {sc}")
            print(f"  spark: {sv[bad]}")
            print(f"  duck : {dv[bad]}")
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                err="values_differ", **base)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sv)} rows)")
        rec(name, rows_match=True, schema_match=True, hash_match=True, **base)
        n_pass += 1

    # queries without an oracle: rows-only check
    for name in sorted(set(f.name.removesuffix(".parquet")
                           for f in __import__("pathlib").Path(out_dir).iterdir()
                           if f.name.endswith(".parquet")) - set(oracles)):
        if only and name not in only:
            continue
        n = pq.read_table(f"{out_dir}/{name}.parquet").num_rows
        print(f"ROWS {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
        rec(name, spark_rows=n, err="no_oracle_rows_only" if n else "empty_result")

    if json_out:
        payload = {"_oracle_version": oracle_version}
        payload.update(dict(sorted(record.items())))
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {json_out}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
