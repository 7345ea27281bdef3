"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column-name schema, and
an order-insensitive value hash (columns sorted by name, rows sorted
by canonical string). Run before committing:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime
import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from kafka_cdc_elasticsearch_pipeline_spark.queries import QUERIES
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark
    from kafka_cdc_elasticsearch_pipeline_spark.sources.tables import TABLE_NAMES

    spark = get_spark("oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or list(QUERIES)
    failures = []
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            df = spec.spark(spark, args.sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            # dedup/similarity queries persist() intermediates; over a
            # 100+ query sweep the stale cache becomes the workload
            # (same lesson as bench.py) — drop it between queries
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"rows  {name}: {len(rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sh, sn = table_hash(cols, rows)
        oh, on = table_hash(ocols, orows)
        schema_ok = sorted(cols) == sorted(ocols)
        if sn == on and sh == oh and schema_ok:
            print(f"PASS  {name}: {sn} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
            print(
                f"FAIL  {name}: rows {sn} vs {on}; schema_ok={schema_ok}; "
                f"hash {'==' if sh == oh else '!='}"
            )
            if not schema_ok:
                print(f"      spark cols:  {sorted(cols)}")
                print(f"      oracle cols: {sorted(ocols)}")
            if args.show_diff and sn and on:
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_lines = sorted("|".join(canon(r[i]) for i in order_s) for r in rows)
                o_lines = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                shown = 0
                for a, b in zip(s_lines, o_lines):
                    if a != b:
                        print(f"      spark : {a}\n      oracle: {b}")
                        shown += 1
                        if shown >= 5:
                            break
    print(f"\n{len(names) - len(failures)}/{len(names)} queries pass")
    if failures:
        print("failures:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
