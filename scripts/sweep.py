"""Full oracle sweep: run every queries() entry and its oracle_sql() on
the same sf dir, compare rows+schema+value-hash the way the driver does
(sort columns by name, sort rows, hash values).

Usage (MUST run with the repo as cwd so Ray workers import saber_ray):

    cd /root/repo && python scripts/sweep.py [SF_DIR] [only,these,queries]

Part of the per-round close-out ritual (see BASELINE.md): full sweeps
at sf0.001, sf0.01 and sf0.1 on the final tree — the sf0.1 sweep is the
one that caught the SimHash bucket-cap recall bug three sf0.01 sweeps
missed. Writes per-query records to /tmp/sweep_results.json."""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         ignore_reinit_error=True)

import __ray_entry__ as entry

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    # ray Dataset: to_pandas on zero blocks loses columns — rebuild
    # the empty frame from the dataset schema
    df = res.to_pandas()
    if df.shape[1] == 0:
        sch = res.schema()
        df = pa.table({n: pa.array([], type=t)
                       for n, t in zip(sch.names, sch.types)}).to_pandas()
    return df


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            df[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(payload.encode()).hexdigest()


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    t_all = time.time()
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "err": None, "sec": None}
        t0 = time.time()
        try:
            mine = to_pandas(fn(SF_DIR))
            rec["sec"] = round(time.time() - t0, 2)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                rec["rows_match"] = len(mine) == len(odf)
                rec["schema_match"] = sorted(map(str, mine.columns)) == sorted(map(str, odf.columns))
                if rec["rows_match"] and rec["schema_match"]:
                    rec["hash_match"] = canon(mine) == canon(odf)
                rec["mine_rows"] = len(mine)
                rec["oracle_rows"] = len(odf)
            else:
                rec["rows_match"] = len(mine) >= 0
                rec["mine_rows"] = len(mine)
        except Exception as ex:
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = rec["hash_match"] if rec["hash_match"] is not None else rec["rows_match"]
        flag = "OK " if ok else "FAIL"
        print(f"{flag} {name:32s} {rec['sec']:>7}s  {rec.get('mine_rows','-')} vs {rec.get('oracle_rows','-')}  {rec['err'] or ''}", flush=True)
    bad = [k for k, r in results.items()
           if r["err"] or r.get("hash_match") is False or r.get("rows_match") is False
           or r.get("schema_match") is False]
    print(f"\nTOTAL {len(results)} queries in {time.time()-t_all:.0f}s; FAILURES: {bad}")
    json.dump(results, open("/tmp/sweep_results.json", "w"), indent=1)
    ray.shutdown()


main()
