#!/usr/bin/env python3
"""Re-time a set of oracle SQL replicas in DuckDB under a wall cap.

Usage: python3 dev/time_oracles.py SFDIR ORACLE_JSON CAP_S q1 q2 ...

Standing round practice (VERDICT r12 ask #8): the sf1 cap-skip set is
re-timed each round before writing slice rows, because oracle rewrites
and environment changes keep flipping families back to feasible.
Prints one line per query: name, wall seconds (or CAP/ERR), row count.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sfdir, oracle_json, cap_s, *names):
    import os.path
    cap = float(cap_s)
    oracle = json.load(open(oracle_json))
    for name in names:
        # fresh connection per query: an interrupted recursive-CTE pipeline
        # can take minutes to actually stop (r12 memory) — don't let it
        # poison the next measurement
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        if name not in oracle:
            print(f"{name}: NOT IN ORACLE JSON", flush=True)
            continue
        done = threading.Event()

        def watchdog(c=con):
            if not done.wait(cap):
                c.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            tbl = con.sql(oracle[name]).arrow()
            print(f"{name}: {time.time()-t0:.1f}s rows={tbl.num_rows}", flush=True)
        except duckdb.InterruptException:
            print(f"{name}: CAP>{cap:.0f}s (interrupted, landed at "
                  f"{time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name}: ERR {str(e)[:160]}", flush=True)
        finally:
            done.set()
            w.join()
            con.close()


if __name__ == "__main__":
    main(*sys.argv[1:])
