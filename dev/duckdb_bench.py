#!/usr/bin/env python3
"""Time the oracle SQL in DuckDB over the same parquet tables the Spark
bench reads, and write dev/duckdb_bench.json — the committed measurement
graft.Bench folds into its JSON line as duckdb_total / sf1_duckdb_total.

DuckDB is a driver-side tool only (the Scala library never touches it);
this script exists so the bench-vs-baseline ratio is machine-readable
instead of living in prose.

Usage:
    python3 dev/duckdb_bench.py /tmp/oracle_sql.json \
        sf0.1=/root/testdata/sf0.1 sf1=/root/repo/local/sf1

Each query runs in a fresh subprocess (DuckDB has no per-query timeout;
a runaway quadratic oracle at sf1 must not hang the tool) with min-of-2
timing inside the subprocess, 180 s wall cap per query.
"""
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Same set the Spark bench times. HEADLINE sums into "total" (the number
# Bench emits); EXTENDED is recorded per-query for the sf1 comparison.
HEADLINE = [
    "q10_tpch_q1", "q11_join_broadcast", "q12_tpch_q3", "q13_tpch_q5",
    "t02_quality_score", "d01_dedup_exact", "d03_minhash_lsh_pairs",
    "e01_sessionize", "s01_ann_brute",
]
EXTENDED = [
    "d08_dup_clusters", "d09_contamination", "c09_inverted_index",
    "c10_inverted_index_sharded", "s02_ann_lsh", "e11_heavy_hitters",
]

# 240 s: the r13 oracle rewrites brought the MinHash/LSH family to
# ~100-110 s per run at sf1 — min-of-2 needs ~220 s, and excluding a query
# DuckDB CAN finish would overstate our ratio. Matches check.py's sf1 cap.
TIMEOUT_S = 240


def _run_one(sfdir, sql, q):
    import duckdb
    import os.path
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # Spark writes a table as a DIRECTORY of part files; DuckDB needs
        # the glob form for those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        times.append(time.monotonic() - t0)
    q.put(min(times))


def run_query(sfdir, sql):
    q = mp.Queue()
    p = mp.Process(target=_run_one, args=(sfdir, sql, q))
    p.start()
    p.join(TIMEOUT_S)
    if p.is_alive():
        p.terminate()
        p.join()
        return None
    return q.get() if not q.empty() else None


def main(oracle_path, *sf_specs):
    oracle = json.load(open(oracle_path))
    # merge into the existing file so one SF can be re-measured alone
    try:
        out = json.load(open("dev/duckdb_bench.json"))
    except (FileNotFoundError, json.JSONDecodeError):
        out = {}
    out["generated_by"] = ("dev/duckdb_bench.py (min-of-2 per query, fresh "
                           "process per query, %d s cap)" % TIMEOUT_S)
    out["threads"] = os.cpu_count()
    for spec in sf_specs:
        label, sfdir = spec.split("=", 1)
        queries, total = {}, 0.0
        missing_from_total = []
        for name in HEADLINE + EXTENDED:
            if name not in oracle:
                continue
            secs = run_query(sfdir, oracle[name])
            queries[name] = secs
            status = "TIMEOUT" if secs is None else f"{secs:.3f}s"
            print(f"[{label}] {name}: {status}", flush=True)
            if name in HEADLINE:
                if secs is None:
                    missing_from_total.append(name)
                else:
                    total += secs
        entry = {"total": round(total, 3), "queries": queries, "dir": sfdir}
        if missing_from_total:
            entry["total_excludes_timeouts"] = missing_from_total
        out[label] = entry
    with open("dev/duckdb_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote dev/duckdb_bench.json")


if __name__ == "__main__":
    main(*sys.argv[1:])
