#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate: for each query dir under OUTDIR
(written by graft.Verify), run the corresponding oracle SQL from
oracle_sql.json in DuckDB over the same sf parquet tables, sort columns
by name, sort rows, and compare values exactly.

Usage: python3 dev/check.py /root/testdata/sf0.01 /tmp/verify_out \
           [out.json] [oracle_cap_s]

The optional third arg writes a driver-format artifact (per-query
rows_match/schema_match/hash_match) — used to commit the sf0.1-scale gate
result (CORRECTNESS_sf0.1.json).

The optional fourth arg is a per-oracle wall cap in seconds (enforced
with con.interrupt() from a watchdog thread; the connection survives).
Queries whose DuckDB replica exceeds the cap are recorded as explicit
skips ({"skipped": ...} rows in the artifact), NOT failures — at sf1 a
handful of oracle replicas (the 16-projection kNN SQL, the quadratic
d03/e01 window replicas) are infeasible in DuckDB even though the Spark
side finishes in seconds; the cap makes that set self-discovering and
machine-readable instead of hand-maintained.
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


class StrayInterrupt(Exception):
    """A second InterruptException whose watchdog never fired — a stray
    from an earlier query's watchdog, NOT a cap exceedance of this query.
    Raised distinctly so the caller doesn't record an unearned cap-skip
    (r11 ADVICE)."""


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def load_spark(path):
    import pyarrow as pa
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def main(sfdir, outdir, json_out=None, oracle_cap_s=None):
    import os.path
    import threading
    cap = float(oracle_cap_s) if oracle_cap_s else None
    con = duckdb.connect()

    def run_oracle(sql):
        """con.sql(...).arrow() under the optional wall cap.

        Watchdog race discipline: a query finishing right AT the cap can
        lose the done.set() race, leaving con.interrupt() to fire on an
        idle connection and abort the NEXT query — which would then be
        mis-recorded as a cap-skip it didn't earn. So (a) the watchdog
        records that it fired, and an InterruptException only counts as a
        cap-skip when THIS query's watchdog fired; (b) a stray interrupt
        is retried once; (c) after a fired-but-finished race the pending
        interrupt is drained with a trivial query before returning.
        """
        if not cap:
            return con.sql(sql).arrow()
        attempts = 0
        while True:
            attempts += 1
            done = threading.Event()
            fired = threading.Event()

            def watchdog():
                if not done.wait(cap):
                    fired.set()
                    con.interrupt()
            w = threading.Thread(target=watchdog, daemon=True)
            w.start()
            try:
                result = con.sql(sql).arrow()
            except duckdb.InterruptException:
                if fired.is_set():
                    raise  # genuine cap-skip for this query
                if attempts >= 2:
                    # two strays in a row: mis-labeling it a cap-skip would
                    # credit this query a cap it never hit
                    raise StrayInterrupt(
                        f"interrupted twice without this query's watchdog "
                        f"firing (cap={cap:.0f}s)")
                continue   # stray interrupt from an earlier watchdog: retry
            finally:
                done.set()
                w.join()
                if fired.is_set():
                    try:
                        con.execute("SELECT 1")
                    except duckdb.InterruptException:
                        pass
            return result
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Completion manifest (written by graft.Verify): the floor on how many
    # query verdicts this run must produce. Guards against the r03/r08
    # failure mode where the round's artifact arrived as `{}` — an artifact
    # below the manifest count is a harvest bug, and emitting it would
    # silently zero the round's correctness signal.
    manifest = None
    try:
        manifest = json.load(open(f"{outdir}/_manifest.json"))
        print(f"manifest: {len(manifest['written'])} written, "
              f"{len(manifest['failed'])} failed, "
              f"{manifest['queries_total']} total")
        for mq, merr in sorted(manifest["failed"].items()):
            print(f"FAILED-IN-VERIFY  {mq}: {merr}")
    except FileNotFoundError:
        print("WARNING: no _manifest.json in verify output (old Verify build?)")
    n_pass = n_fail = n_skip = n_rows_only = 0
    report = {}

    def rec(name, rows_match, schema_match, hash_match, s_rows, d_rows, err):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": s_rows,
                        "oracle_rows": d_rows, "err": err}

    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        spark_tbl = load_spark(qdir)
        if spark_tbl is None:
            print(f"SKIP  {name}: no spark output")
            rec(name, False, False, False, 0, 0, "no spark output")
            n_skip += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={spark_tbl.num_rows} (no oracle)")
            n_rows_only += 1
            n_skip += 1
            continue
        try:
            import time as _time
            _t0 = _time.time()
            duck_tbl = run_oracle(oracle[name])
            _el = _time.time() - _t0
            if _el > 1.0:
                print(f"TIME  {name}: oracle {_el:.1f}s")
        except StrayInterrupt as e:
            print(f"FAIL  {name}: stray interrupt (not a cap-skip): {e}")
            rec(name, False, False, False, spark_tbl.num_rows, 0,
                f"stray interrupt: {e}")
            n_fail += 1
            continue
        except duckdb.InterruptException:
            print(f"SKIP  {name}: oracle exceeded {cap:.0f}s wall cap "
                  f"(spark rows={spark_tbl.num_rows})")
            report[name] = {"skipped": f"oracle wall cap {cap:.0f}s",
                            "spark_rows": spark_tbl.num_rows}
            n_skip += 1
            continue
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            rec(name, False, False, False, spark_tbl.num_rows, 0, str(e)[:200])
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns differ spark={s_cols} duck={d_cols}")
            rec(name, spark_tbl.num_rows == duck_tbl.num_rows, False, False,
                spark_tbl.num_rows, duck_tbl.num_rows, "schema mismatch")
            n_fail += 1
            continue
        # Arrow TYPE comparison — the driver's hash is type-CLASS-sensitive
        # (r11: DuckDB SUM(BIGINT) → HUGEINT → decimal128(38,0) vs Spark
        # int64 hash-failed 8 queries whose VALUES were equal; as_py()
        # compares Decimal(123) == 123 so the value check below cannot see
        # it). Calibrated against CORRECTNESS_r11.json: integer WIDTHS are
        # canonicalized by the driver (q22/q43/s01/d04/... ship spark int32
        # vs duck int64/int8 and were driver-GREEN), as are
        # string/large_string (arrow's large-offset variant of the same
        # logical type) — but decimal vs int is a driver hash fail even
        # with equal values. So: fold all arrow integer widths into one
        # class, fold string variants, keep everything else (notably
        # decimal128) strict.
        def canon_type(t):
            import pyarrow as pa
            import pyarrow.types as pt
            if t in (pa.large_string(), pa.string()):
                return "string"
            if pt.is_integer(t):
                return "int"
            return str(t)
        type_bad = [
            (c, str(spark_tbl.schema.field(c).type),
             str(duck_tbl.schema.field(c).type))
            for c in s_cols
            if canon_type(spark_tbl.schema.field(c).type)
            != canon_type(duck_tbl.schema.field(c).type)]
        if type_bad:
            c, st, dt = type_bad[0]
            print(f"FAIL  {name}: arrow type-class mismatch "
                  f"({len(type_bad)} cols); first: {c} spark={st} duck={dt} "
                  f"— driver hash WILL fail (CAST the oracle column)")
            rec(name, spark_tbl.num_rows == duck_tbl.num_rows, True, False,
                spark_tbl.num_rows, duck_tbl.num_rows,
                f"type mismatch: {c} spark={st} duck={dt}")
            n_fail += 1
            continue
        s_rows = sorted(
            (tuple(norm(v) for v in row)
             for row in zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])),
            key=repr)
        d_rows = sorted(
            (tuple(norm(v) for v in row)
             for row in zip(*[duck_tbl.column(c).to_pylist() for c in d_cols])),
            key=repr)
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            rec(name, False, True, False, len(s_rows), len(d_rows), None)
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:")
            print(f"      cols : {s_cols}")
            print(f"      spark: {a}")
            print(f"      duck : {b}")
            rec(name, True, True, False, len(s_rows), len(d_rows), None)
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows")
            rec(name, True, True, True, len(s_rows), len(d_rows), None)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only/skip")
    # Refuse to write an artifact that would under-report the gate: zero
    # queries, or fewer verdicts than the manifest says Verify produced.
    if json_out:
        floor = len(manifest["written"]) if manifest else 1
        # rows-only queries have no report row; no-output skips DO get a
        # report row, so counting all of n_skip here would double-count
        # them and let an under-covering run clear the manifest floor
        covered = len(report) + n_rows_only
        if covered == 0 or covered < floor:
            print(f"REFUSING to write {json_out}: covered {covered} queries "
                  f"but manifest floor is {floor} — artifact would zero the "
                  f"round's correctness signal (harvest bug, not engine bug)")
            return 2
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
