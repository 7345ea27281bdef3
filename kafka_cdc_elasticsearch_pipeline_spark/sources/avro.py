"""Registry-less Avro binary codec (SURVEY §2.1 S1/S4).

Every topic in the reference is Avro-with-Schema-Registry
(``VALUE_FORMAT='AVRO'`` — ksqldb-statements.sql:36-37,42-43; registry
service docker-compose.yml:59-72). Spark's JVM ``from_avro`` lives in
the external spark-avro package, absent from this environment — so the
engine ships its own decoder for the Avro *binary record encoding*
(the payload behind the registry's 5-byte Confluent frame: magic 0x00
+ big-endian int32 schema id), driven through Arrow-batched
``mapInPandas``.

Scope: record schemas of primitive fields (null, boolean, int, long,
float, double, bytes, string) and nullable unions ``["null", X]`` —
exactly the shape of the reference's ratings/customers values. A
``long`` with logicalType timestamp-millis/micros decodes to the raw
long (cast downstream; keeps the codec byte-faithful).

Scale honesty: this is a per-record Python decode inside an Arrow
batch — the right tool when the spark-avro jar is unavailable, and the
plumbing (binary column in, declared StructType out, batch iterator)
is identical to the JVM path, so swapping ``from_avro`` in on a real
cluster is a one-line change in ``kafka.decode_value``.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CONFLUENT_MAGIC = 0


# --- schema handling ---------------------------------------------------------


def _field_type(t) -> tuple[str, bool]:
    """Normalize an Avro field type → (primitive name, nullable)."""
    if isinstance(t, dict):  # logical types ride on the base primitive
        return t["type"], False
    if isinstance(t, list):  # union — only ["null", X] / [X, "null"]
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1 or len(t) > 2:
            raise ValueError(f"only nullable unions are supported, got {t}")
        base, _ = _field_type(non_null[0])
        return base, True
    return t, False


def parse_record_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Avro record schema JSON → [(field, primitive, nullable)]."""
    schema = json.loads(schema_json)
    if schema.get("type") != "record":
        raise ValueError("top-level schema must be a record")
    out = []
    for f in schema["fields"]:
        prim, nullable = _field_type(f["type"])
        out.append((f["name"], prim, nullable))
    return out


_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def spark_schema_for(schema_json: str) -> T.StructType:
    """The StructType the decoded frame carries (drives mapInPandas)."""
    return T.StructType(
        [
            T.StructField(name, _SPARK_TYPES[prim], nullable=True)
            for name, prim, _ in parse_record_schema(schema_json)
        ]
    )


# --- binary primitives -------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(out: bytearray, n: int) -> None:
    u = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_record(row: dict, fields: list[tuple[str, str, bool]]) -> bytes:
    """One row → Avro binary record body (no framing)."""
    out = bytearray()
    for name, prim, nullable in fields:
        v = row.get(name)
        if nullable:
            if v is None:
                _write_long(out, 0)  # union branch 0 = null
                continue
            _write_long(out, 1)
        elif v is None:
            raise ValueError(f"null in non-nullable field {name}")
        if prim in ("int", "long"):
            _write_long(out, int(v))
        elif prim == "string":
            raw = str(v).encode("utf-8")
            _write_long(out, len(raw))
            out += raw
        elif prim == "bytes":
            _write_long(out, len(v))
            out += bytes(v)
        elif prim == "double":
            out += struct.pack("<d", float(v))
        elif prim == "float":
            out += struct.pack("<f", float(v))
        elif prim == "boolean":
            out.append(1 if v else 0)
        elif prim == "null":
            pass
        else:
            raise ValueError(f"unsupported avro primitive: {prim}")
    return bytes(out)


def decode_record(buf: bytes, fields: list[tuple[str, str, bool]]) -> dict:
    """Avro binary record body → dict (no framing)."""
    pos = 0
    row: dict = {}
    for name, prim, nullable in fields:
        if nullable:
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                row[name] = None
                continue
        if prim in ("int", "long"):
            row[name], pos = _read_long(buf, pos)
        elif prim == "string":
            n, pos = _read_long(buf, pos)
            row[name] = bytes(buf[pos : pos + n]).decode("utf-8")
            pos += n
        elif prim == "bytes":
            n, pos = _read_long(buf, pos)
            row[name] = bytes(buf[pos : pos + n])
            pos += n
        elif prim == "double":
            (row[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif prim == "float":
            (row[name],) = struct.unpack_from("<f", buf, pos)
            pos += 4
        elif prim == "boolean":
            row[name] = buf[pos] != 0
            pos += 1
        elif prim == "null":
            row[name] = None
        else:
            raise ValueError(f"unsupported avro primitive: {prim}")
    return row


def confluent_frame(body: bytes, schema_id: int) -> bytes:
    """Wrap a record body in the registry wire format."""
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id) + body


def strip_confluent_frame(payload: bytes) -> tuple[int, bytes]:
    """(schema_id, body); raises on a bad magic byte."""
    magic, schema_id = struct.unpack_from(">bI", payload, 0)
    if magic != CONFLUENT_MAGIC:
        raise ValueError(f"bad Confluent magic byte: {magic}")
    return schema_id, payload[5:]


# --- DataFrame-level codec (Arrow-batched) -----------------------------------


def avro_encode(
    df: DataFrame, schema_json: str, schema_id: int | None = None
) -> DataFrame:
    """Encode every row into a single binary ``value`` column
    (Confluent-framed when ``schema_id`` is given) — the producer side
    of S8's Avro topics."""
    fields = parse_record_schema(schema_json)
    cols = [name for name, _, _ in fields]

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf[cols].to_dict("records")
            values = [encode_record(r, fields) for r in rows]
            if schema_id is not None:
                values = [confluent_frame(v, schema_id) for v in values]
            yield pd.DataFrame({"value": values})

    return df.mapInPandas(_enc, "value binary")


def avro_decode(
    df: DataFrame,
    schema_json: str,
    value_col: str = "value",
    confluent: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Decode a binary Avro ``value`` column into typed columns — the
    registry-less stand-in for ``from_avro`` (S1/S4). ``keep_cols``
    pass through unchanged (message key / ROWTIME metadata)."""
    fields = parse_record_schema(schema_json)
    decoded_schema = spark_schema_for(schema_json)
    kept = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(list(kept) + list(decoded_schema.fields))
    decoded_names = [f.name for f in decoded_schema.fields]

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[value_col]:
                body = bytes(payload)
                if confluent:
                    _, body = strip_confluent_frame(body)
                rows.append(decode_record(body, fields))
            decoded = pd.DataFrame(rows, columns=decoded_names)
            for c in reversed(keep_cols):
                decoded.insert(0, c, pdf[c].reset_index(drop=True))
            yield decoded

    return df.select(*keep_cols, value_col).mapInPandas(_dec, out_schema)
