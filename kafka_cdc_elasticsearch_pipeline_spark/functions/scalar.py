"""Scalar function surface (SURVEY §2.8, F1-F7).

The reference uses exactly these scalar functions; each wrapper maps
one ksqlDB builtin to its Spark-native, whole-stage-codegen-friendly
equivalent (no Python UDFs anywhere on this path).

Reference citations:
- LCASE                  -> ksqldb-statements.sql:14,17
- string ``+`` (concat)  -> ksqldb-statements.sql:54
- CAST(x AS STRING/INT)  -> ksqldb-statements.sql:58, readme.md:444
- TIMESTAMPTOSTRING      -> ksqldb-statements.sql:96, readme.md:325
- LIKE / NOT LIKE        -> ksqldb-statements.sql:14,17 (native Column.like)
- comparisons / IS NOT NULL -> ksqldb-statements.sql:59,66-67 (native)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lcase(c: Column | str) -> Column:
    """F1 — ksqlDB ``LCASE(s)`` (ksqldb-statements.sql:14)."""
    return F.lower(_col(c))


def str_concat(*cols: Column | str) -> Column:
    """F2 — ksqlDB string ``+`` is null-propagating concatenation
    (ksqldb-statements.sql:54). Spark ``concat`` has identical NULL
    semantics (any NULL input -> NULL); ``concat_ws`` would silently
    differ, so it is deliberately not used here.
    """
    return F.concat(*[_col(c) for c in cols])


def cast_string(c: Column | str) -> Column:
    """F3 — ``CAST(x AS STRING)`` (ksqldb-statements.sql:58)."""
    return _col(c).cast("string")


def cast_int(c: Column | str) -> Column:
    """F4 — ``CAST(x AS INT)`` (readme.md:444)."""
    return _col(c).cast("int")


def timestamp_to_string(c: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """F5 — ksqlDB ``TIMESTAMPTOSTRING(ts, fmt)`` for a timestamp
    column (ksqldb-statements.sql:96); formats with a Java
    DateTimeFormatter pattern via ``date_format``. For the epoch-millis
    BIGINT form the reference also uses (readme.md:589-597), see
    ``timestamp_ms_to_string``.
    """
    return F.date_format(_col(c), fmt)


def timestamp_ms_to_string(c: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """F5 (epoch-millis form): format a BIGINT epoch-ms column."""
    return F.date_format(F.timestamp_millis(_col(c)), fmt)
