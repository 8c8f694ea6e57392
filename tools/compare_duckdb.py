#!/usr/bin/env python3
"""Side-by-side DuckDB comparison for the bench headline queries.

DuckDB 1.0.0 (python) runs each headline query's oracle SQL over the same
sf-dir parquet tables: fresh connection per run, full result fetchall;
N runs — first is cold, median of the rest is warm. Spark numbers are read
from an existing Bench JSON (BENCH_local.json by default).

Usage: compare_duckdb.py [sfDir] [benchJson] [outJson] [runs]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Rows where the Spark bench times a different (production) algorithm than
# the exact oracle SQL DuckDB runs — same task, honest asymmetry, noted.
ALGO_NOTES = {
    "d16_incremental_fuzzy": (
        "Spark times the production banded-LSH delta-vs-base operator "
        "(graft.queries.DedupQ.d16LshOnly); the exact cross-pair union is "
        "verify-only oracle scaffolding. DuckDB runs the exact-jaccard "
        "oracle — the task's exact algorithm."),
    "d04_minhash_lsh": (
        "Spark times the production LSH-verified operator "
        "(graft.queries.DedupQ.d04LshOnly); the ledger row additionally "
        "unions the corpus-wide exact-jaccard relation (d03's whole "
        "computation) as verify-only oracle scaffolding. DuckDB runs the "
        "exact-jaccard oracle — the task's exact algorithm."),
}


def load_oracles(out_dir="/tmp/verify_out"):
    with open(f"{out_dir}/oracle_sql.json") as f:
        raw = json.load(f)
    return {k.removesuffix(".parquet"): v for k, v in raw.items()}


def time_duckdb(sql, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    t0 = time.time()
    con.execute(sql).fetchall()
    dt = time.time() - t0
    con.close()
    return dt


def duck_noop(sf_dir, n=8):
    """Duck-leg ambient-load sentinel (the spark leg's load_sentinel twin):
    a fixed-shape probe — fresh connection + tiny parquet scan-agg — whose
    median/max spread says whether THIS leg's window was quiet. A pairing
    is only condition-matched when BOTH legs' sentinels are clean
    (r15 lesson: a spark leg from a quiet window against duck legs from a
    loaded one flattered the ratio to 0.58x)."""
    times = []
    for _ in range(n):
        con = duckdb.connect()
        t0 = time.time()
        con.execute(f"SELECT count(*), max(n_nationkey) FROM "
                    f"read_parquet('{sf_dir}/nation.parquet')").fetchall()
        times.append(time.time() - t0)
        con.close()
    return {"probe_med": round(statistics.median(times), 4),
            "probe_max": round(max(times), 4)}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_local.json"
    out_json = sys.argv[3] if len(sys.argv) > 3 else "DUCKDB_COMPARE_r04.json"
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    bench = json.load(open(bench_json))
    oracles = load_oracles()
    duck_sentinel_pre = duck_noop(sf_dir)
    out = {
        "method": (
            f"DuckDB 1.0.0 (python) runs the identical oracle SQL over the same "
            f"{sf_dir.rsplit('/', 1)[-1]} parquet, fresh connection per run, full result "
            f"fetchall; {runs} runs: first=cold, median of rest. Spark numbers from "
            f"{bench_json} (full internal-row materialization, shape-warmed process, "
            f"n={bench['n']}: first=cold, median of warm runs)."),
        "queries": {},
    }
    tot = {"duckdb_cold": 0.0, "duckdb_median": 0.0,
           "spark_cold": 0.0, "spark_warm_median": 0.0}
    for name in bench["queries"]:
        q = {"spark_cold": bench["queries"][name],
             "spark_warm_median": bench["queries_warm"][name]}
        if name in oracles:
            times = [time_duckdb(oracles[name], sf_dir) for _ in range(runs)]
            q["duckdb_cold"] = round(times[0], 3)
            q["duckdb_median"] = round(statistics.median(times[1:]), 3)
            tot["duckdb_cold"] += times[0]
            tot["duckdb_median"] += q["duckdb_median"]
            tot["spark_cold"] += q["spark_cold"]
            tot["spark_warm_median"] += q["spark_warm_median"]
        else:
            q["duckdb_cold"] = q["duckdb_median"] = None
            q["note"] = "no oracle (hash-impl-specific op)"
        if name in ALGO_NOTES:
            q["note"] = ALGO_NOTES[name]
        out["queries"][name] = q
    out["subset_totals"] = {
        "duckdb_cold": round(tot["duckdb_cold"], 2),
        "duckdb_median": round(tot["duckdb_median"], 2),
        "spark_cold": round(tot["spark_cold"], 2),
        "spark_warm_median": round(tot["spark_warm_median"], 2),
        "ratio_cold": round(tot["spark_cold"] / tot["duckdb_cold"], 2),
        "ratio_warm": round(tot["spark_warm_median"] / tot["duckdb_median"], 2),
    }
    out["duck_load_sentinel"] = {
        "pre": duck_sentinel_pre, "post": duck_noop(sf_dir),
        "note": ("fresh-connection nation scan-agg, 8 probes before/after "
                 "the duck legs; pair with the spark leg's load_sentinel "
                 "in the bench JSON — commit only when both are clean")}
    out["spark_load_sentinel"] = bench.get("load_sentinel")
    out["constant_floor_note"] = (
        f"Spark's per-query scheduling floor (noop_sec={bench['noop_sec']}s steady-state) "
        f"times the comparable-query count is constant overhead, not data-path cost "
        f"(DuckDB embedded has ~zero per-query setup); these constants amortize away at "
        f"larger scale factors and on a resident cluster.")
    json.dump(out, open(out_json, "w"), indent=1)
    st = out["subset_totals"]
    print(f"cold {st['spark_cold']}/{st['duckdb_cold']} = {st['ratio_cold']}x ; "
          f"warm {st['spark_warm_median']}/{st['duckdb_median']} = {st['ratio_warm']}x")


if __name__ == "__main__":
    main()
