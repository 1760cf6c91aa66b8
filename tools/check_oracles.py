"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry in Spark and its ``oracle_sql()`` twin
in DuckDB on the same sf parquet tables; compare row count, column names,
and sorted values (exact for strings/ints, 1e-9 for floats).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(name, spark_df, sql, con) -> str:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return f"SCHEMA MISMATCH spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    cols = sorted(sp.columns)
    sp = sp[cols]
    du = du[cols]
    if len(sp) != len(du):
        return f"ROWCOUNT MISMATCH spark={len(sp)} duck={len(du)}"
    sp_rows = sorted(sp.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    du_rows = sorted(du.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                fx = float("nan") if x is None else float(x)
                fy = float("nan") if y is None else float(y)
                if math.isnan(fx) and math.isnan(fy):
                    continue
                if abs(fx - fy) > 1e-9:
                    return f"VALUE MISMATCH row {i}: {a} vs {b}"
            elif (x is None) != (y is None) or (x is not None and str(x) != str(y)):
                return f"VALUE MISMATCH row {i}: {a} vs {b}"
    return f"OK ({len(sp)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pagerank_optimization_spark.session import get_spark

    spark = get_spark(app_name="check-oracles", cores=int(os.environ.get("SPARK_TEST_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name:28s} (no oracle — rows-only)")
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} rows={n}")
            continue
        try:
            verdict = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as ex:  # noqa: BLE001
            verdict = f"EXC {type(ex).__name__}: {str(ex)[:300]}"
        ok = verdict.startswith("OK")
        failures += 0 if ok else 1
        print(f"{name:28s} {verdict}")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
