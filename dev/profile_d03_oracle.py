#!/usr/bin/env python3
"""Stage-by-stage timing of the d03 oracle replica at a given SF dir.

Extracts the CTE chain from the committed oracle SQL and times cumulative
prefixes (corpus -> shingled -> elsig -> sigs -> buckets -> full), so the
rewrite effort lands on the stage that actually dominates.
"""
import json
import re
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sfdir, oracle_json, name="d03_minhash_lsh_pairs"):
    import os.path
    sql = json.load(open(oracle_json))[name]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    # find top-level CTE names in order
    body = sql
    # probe prefixes: run WITH <ctes up to X> SELECT count(*) FROM X
    for probe in ["corpus", "shingled", "el", "elsig", "docel", "sigrow",
                  "sigs", "buckets", "hot", "pruned", "cand"]:
        # cut the WITH chain right after the probe CTE's definition:
        # find ",\n<next> AS" boundaries by scanning for '<name> AS' tokens
        m = re.search(rf"\b{probe} AS\b", body)
        if not m:
            print(f"{probe}: not found")
            continue
        # find the start of the NEXT CTE definition after probe
        rest = body[m.end():]
        nxt = re.search(r",\s*\n(\w+) AS\b", rest)
        if nxt:
            cut = m.end() + nxt.start()
            prefix = body[:cut]
        else:
            # probe is the last CTE; cut before final SELECT
            fin = re.search(r"\)\s*\nSELECT", rest)
            prefix = body[: m.end() + fin.start() + 1]
        q = prefix + f"\nSELECT COUNT(*) FROM {probe}"
        t0 = time.time()
        try:
            n = con.sql(q).fetchone()[0]
            print(f"{probe}: {time.time()-t0:.1f}s rows={n}", flush=True)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            print(f"{probe}: ERR {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
