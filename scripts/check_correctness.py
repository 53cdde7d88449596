#!/usr/bin/env python
"""Local proxy for the driver's correctness gate: run each __spark_entry__
query AND its DuckDB oracle at a given sf dir, compare row count, schema
arity, and sorted values (columns sorted by name, rows sorted — the
driver's documented comparison shape).

Usage: python scripts/check_correctness.py [--sf /root/testdata/sf0.01]
       [--only name1,name2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # + 0.0 collapses -0.0 (round(-1e-9, 6) is -0.0, whose repr
                # differs from '0.0') so a zero metric computed with opposite
                # sign on the two engines never hash-mismatches
                v = round(v, 6) + 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--only", default=None)
    args = p.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from cargo_dupes_spark.session import build_session

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"create view {t} as select * from read_parquet('{path}')"
            )

    spark = build_session(app_name="check-correctness", parallelism=16)
    results: dict[str, dict] = {}
    try:
        for name in names:
            res: dict = {}
            try:
                sdf = qs[name](spark, args.sf)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                res["spark_rows"] = len(srows)
                if name not in oracles:
                    res["err"] = "no_oracle"
                else:
                    orel = con.execute(oracles[name])
                    ocols = [d[0] for d in orel.description]
                    orows = orel.fetchall()
                    res["oracle_rows"] = len(orows)
                    res["rows_match"] = len(srows) == len(orows)
                    res["schema_match"] = sorted(scols) == sorted(ocols)
                    res["hash_match"] = normalize(srows, scols) == normalize(
                        orows, ocols
                    )
                    if not res["hash_match"]:
                        a = normalize(srows, scols)
                        b = normalize(orows, ocols)
                        diff = [x for x in a if x not in set(b)][:3]
                        diff += [x for x in b if x not in set(a)][:3]
                        res["sample_diff"] = diff
            except Exception as e:  # noqa: BLE001
                res["err"] = f"{type(e).__name__}: {e}"[:400]
            results[name] = res
            ok = res.get("hash_match")
            print(f"{name}: {'OK' if ok else json.dumps(res)[:300]}", flush=True)
    finally:
        spark.stop()
    bad = [
        n
        for n, r in results.items()
        if r.get("err") not in (None, "no_oracle")
        or (r.get("err") is None and not r.get("hash_match"))
    ]
    print(json.dumps({"bad": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
