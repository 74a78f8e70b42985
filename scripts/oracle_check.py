"""Round-6 optimization guard: re-run declared queries against the DuckDB
oracle (the driver's own check, locally reproduced) so any plan change that
alters RESULTS is caught before commit.

Usage: python scripts/oracle_check.py [--sf /root/testdata/sf0.1] q01 t05 ...
       (no names = every query that has an oracle)
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["documents", "lineitem", "orders", "customer", "nation", "region",
          "events", "embeddings", "part", "supplier"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from docvision_spark.pipeline.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="oracle-check", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    reg, orc = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"create view {t} as select * from read_parquet('{path}')")

    names = [n for n in (args.names or sorted(orc))
             if any(k.startswith(n) or k == n for k in orc)]
    resolved = []
    for n in names:
        resolved += [k for k in orc if k == n or k.startswith(n + "_")
                     or (len(n) <= 3 and k.startswith(n))]
    names = sorted(set(resolved)) or sorted(orc)

    failures = []
    for name in names:
        if name not in reg:
            continue
        try:
            sdf = reg[name](spark, args.sf).toPandas()
            odf = con.execute(orc[name]).df()
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), \
                f"schema {cols} vs {sorted(odf.columns)}"
            s = sdf[cols].sort_values(cols).reset_index(drop=True)
            o = odf[cols].sort_values(cols).reset_index(drop=True)
            assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
            for c in cols:
                sv, ov = s[c], o[c]
                if sv.dtype.kind in "fc" or ov.dtype.kind in "fc":
                    import numpy as np
                    ok = np.allclose(sv.astype(float).fillna(-1e18),
                                     ov.astype(float).fillna(-1e18),
                                     rtol=0, atol=1e-9)
                else:
                    ok = (sv.astype(str).values == ov.astype(str).values).all()
                assert ok, f"column {c} differs"
            print(f"PASS {name} ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {e}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
