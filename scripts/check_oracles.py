"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive value hash. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df) -> tuple[int, list[str], str]:
    """(rows, sorted cols, order-insensitive md5 of stringified cells)."""
    import math

    cols = sorted(df.columns)
    df = df[cols]
    lines = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL")
            else:
                # Plain str(), matching the driver's canonicalizer: float64
                # 4.0 must NOT collapse to "4" or DuckDB HUGEINT→float64
                # promotion is masked locally (round-3 verdict, sessionize /
                # hot_domains / data_pipeline). Oracle SQL must cast
                # SUM-derived integers with ::BIGINT.
                cells.append(str(v))
        lines.append("\x1f".join(cells))
    lines.sort()
    return len(lines), cols, hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from relation_extraction_spark.session import get_spark

    spark = get_spark(app_name="check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        sr, sc, sh = canon(sdf)
        orr, oc, oh = canon(odf)
        status = "OK  " if (sr, sc, sh) == (orr, oc, oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark={sr} duck={orr} cols={'=' if sc == oc else f'{sc} vs {oc}'} "
              f"hash={'=' if sh == oh else 'DIFF'} [{time.time()-t0:.1f}s]")
    spark.stop()
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
