"""Local replica of the driver's correctness gate: run every queries()
entry in Spark AND its oracle_sql() in DuckDB at sf0.01, compare row count,
column-name set, and an order-insensitive value hash (columns sorted by
name, rows sorted, floats rounded).

Usage: python tools/selfcheck.py [--sf-dir /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def canonical(df: pd.DataFrame) -> tuple[int, tuple, str]:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else "")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return len(df), tuple(sorted(df.columns)), hashlib.sha256(payload).hexdigest()[:16]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--only", default=None)
    parser.add_argument("--cpus", type=int, default=8)
    parser.add_argument(
        "--json-out",
        default=None,
        help="also write per-query verdicts in the driver's CORRECTNESS format "
        "(rows/schema/hash match + row counts) — the committed full-surface "
        "evidence complementing the driver's ~50-entry window",
    )
    args = parser.parse_args()

    import __spark_entry__ as entrymod
    from pilsner_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", cpus=args.cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{args.sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [args.only] if args.only else list(qs)
    failures = []
    verdicts: dict = {}
    for name in names:
        start = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            verdicts[name] = {"err": str(e).splitlines()[0][:200]}
            print(f"FAIL  {name:28s} spark error: {str(e).splitlines()[0][:140]}")
            continue
        if name not in oracles:
            verdicts[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": None,
                "note": "no oracle (iterative/non-SQL), rows-only",
            }
            print(f"ROWS  {name:28s} rows={len(sdf)} (no oracle, rows-only) {time.time()-start:5.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            verdicts[name] = {"err": "duckdb: " + str(e).splitlines()[0][:200]}
            print(f"FAIL  {name:28s} duckdb error: {str(e).splitlines()[0][:140]}")
            continue
        sn, sc, sh = canonical(sdf)
        on, oc, oh = canonical(odf)
        status = "OK" if (sn, sc, sh) == (on, oc, oh) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        verdicts[name] = {
            "rows_match": sn == on, "schema_match": sc == oc, "hash_match": sh == oh,
            "spark_rows": sn, "oracle_rows": on, "err": None,
        }
        print(f"{status:5s} {name:28s} spark=({sn},{sh}) duck=({on},{oh}) cols={'=' if sc == oc else f'{sc} vs {oc}'} {time.time()-start:5.1f}s")
        if status != "OK" and sc == oc and sn and on:
            s1, o1 = sdf[sorted(sdf.columns)], odf[sorted(odf.columns)]
            s1 = s1.sort_values(by=list(s1.columns)).reset_index(drop=True)
            o1 = o1.sort_values(by=list(o1.columns)).reset_index(drop=True)
            print("  spark head:", s1.head(2).to_dict("records"))
            print("  duck  head:", o1.head(2).to_dict("records"))
    if args.json_out:
        import json
        import subprocess

        head = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "rev-parse", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        payload = {"_meta": {"sf_dir": args.sf_dir, "git_head": head, "n_queries": len(names)}}
        payload.update(verdicts)
        with open(args.json_out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json_out}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
