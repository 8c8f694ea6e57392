#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify dump (outDir/<name>.parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf-dir parquet tables, sorts columns by
name / rows by all columns, and compares row counts, schemas and values.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

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
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue

        sc, sv = canon(s_rows, s_cols)
        dc, dv = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        # type comparison (warn-level: the driver's exact mapping is unknown)
        ARROW2DUCK = {"int64": "BIGINT", "int32": "INTEGER", "int16": "SMALLINT",
                      "double": "DOUBLE", "float": "FLOAT", "string": "VARCHAR",
                      "large_string": "VARCHAR", "bool": "BOOLEAN",
                      "date32[day]": "DATE"}
        try:
            rel = con.sql(sql)
            d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception:
            d_types = {}
        for i, col_name in enumerate(tbl.column_names):
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
                print(f"WARN {name}: column {col_name} type spark={at} duck={dt}")
        if len(sv) != len(dv):
            print(f"FAIL {name}: rows spark={len(sv)} duck={len(dv)}")
            n_fail += 1
            continue
        if sv != dv:
            bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  cols : {sc}")
            print(f"  spark: {sv[bad]}")
            print(f"  duck : {dv[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sv)} rows)")
        n_pass += 1

    # queries without an oracle: rows-only check
    for name in sorted(set(f.name.removesuffix(".parquet")
                           for f in __import__("pathlib").Path(out_dir).iterdir()
                           if f.name.endswith(".parquet")) - set(oracles)):
        if only and name not in only:
            continue
        n = pq.read_table(f"{out_dir}/{name}.parquet").num_rows
        print(f"ROWS {name}: {n} rows {'(EMPTY!)' if n == 0 else ''}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
