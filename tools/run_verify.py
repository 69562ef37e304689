"""Local mirror of the driver's correctness gate: run every catalog
query AND its DuckDB oracle at sf0.01, compare rows + values.

Usage: python tools/run_verify.py [sf_dir]  (writes /tmp/verify_out.json)
"""
import json
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402
from voter_gateway_spark.session import build_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    results = {}
    for name, fn in qs.items():
        try:
            got = fn(spark, sf).toPandas()
            if name not in oracles:
                results[name] = {"status": "no_oracle", "rows": len(got)}
                print(name, "NO_ORACLE", len(got), flush=True)
                continue
            exp = con.sql(oracles[name]).df()
            if len(got) != len(exp):
                results[name] = {"status": "rows_mismatch", "got": len(got), "exp": len(exp)}
                print(name, "ROWS_MISMATCH", len(got), len(exp), flush=True)
                continue
            if sorted(got.columns) != sorted(exp.columns):
                results[name] = {
                    "status": "schema_mismatch",
                    "got": sorted(got.columns), "exp": sorted(exp.columns),
                }
                print(name, "SCHEMA_MISMATCH", flush=True)
                continue
            cols = sorted(got.columns)
            gc = got[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
            ec = exp[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
            if gc.equals(ec):
                results[name] = {"status": "ok", "rows": len(got)}
                print(name, "OK", len(got), flush=True)
            else:
                diff = (gc != ec).any(axis=1)
                results[name] = {"status": "value_mismatch", "n_diff": int(diff.sum())}
                print(name, "VALUE_MISMATCH", int(diff.sum()), "rows differ", flush=True)
        except Exception as ex:  # noqa: BLE001
            results[name] = {"status": "error", "err": repr(ex)[:300]}
            print(name, "ERROR", repr(ex)[:200], flush=True)
    bad = {k: v for k, v in results.items() if v["status"] not in ("ok", "no_oracle")}
    print("TOTAL", len(results), "BAD", len(bad), flush=True)
    with open("/tmp/verify_out.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
