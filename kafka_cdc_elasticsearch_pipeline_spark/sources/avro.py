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
    """Normalize an Avro field type → (primitive name, nullable).
    The decimal logical type (Debezium's encoding for SQL DECIMAL
    columns: two's-complement big-endian unscaled value in ``bytes``)
    normalizes to the synthetic primitive ``decimal:P:S``; other
    logical types (timestamp-millis/micros) ride their base primitive
    and decode to the raw long, cast downstream."""
    if isinstance(t, dict):
        if t.get("logicalType") == "decimal":
            if t["type"] != "bytes":
                raise ValueError("decimal logical type only supported on bytes")
            return f"decimal:{t.get('precision', 38)}:{t.get('scale', 0)}", False
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


def _spark_type(prim: str) -> T.DataType:
    if prim.startswith("decimal:"):
        _, p, s = prim.split(":")
        return T.DecimalType(int(p), int(s))
    return _SPARK_TYPES[prim]


def spark_schema_for(schema_json: str) -> T.StructType:
    """The StructType the decoded frame carries (drives mapInPandas)."""
    return T.StructType(
        [
            T.StructField(name, _spark_type(prim), nullable=True)
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
        elif prim.startswith("decimal:"):
            # Debezium decimal: two's-complement big-endian unscaled
            # value, minimal length, as an Avro bytes value
            import decimal as _dec

            scale = int(prim.split(":")[2])
            unscaled = int(_dec.Decimal(v).scaleb(scale).to_integral_value())
            raw = unscaled.to_bytes(unscaled.bit_length() // 8 + 1, "big", signed=True)
            _write_long(out, len(raw))
            out += raw
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
        elif prim.startswith("decimal:"):
            import decimal as _dec

            scale = int(prim.split(":")[2])
            n, pos = _read_long(buf, pos)
            unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
            pos += n
            row[name] = _dec.Decimal(unscaled).scaleb(-scale)
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


# --- schema resolution (registry evolution contract) -------------------------

#: legal primitive promotions, writer → readers (Avro spec "Schema
#: Resolution"); string↔bytes is the representational pair.
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


def _fields_with_defaults(schema_json: str) -> list[tuple[str, str, bool, bool, object]]:
    """[(name, primitive, nullable, has_default, default)]."""
    schema = json.loads(schema_json)
    if schema.get("type") != "record":
        raise ValueError("top-level schema must be a record")
    out = []
    for f in schema["fields"]:
        prim, nullable = _field_type(f["type"])
        out.append((f["name"], prim, nullable, "default" in f, f.get("default")))
    return out


def resolve_schemas(writer_json: str, reader_json: str) -> list[tuple]:
    """Avro schema-resolution plan: how to decode a record WRITTEN
    under ``writer_json`` into the shape of ``reader_json`` — the
    contract a Schema Registry consumer lives by (reader schema fixed,
    writer schema varies per message by schema id).

    Rules (Avro spec "Schema Resolution", the subset matching this
    codec's record-of-primitives scope): fields match by NAME;
    writer-only fields are skipped (their bytes still consumed);
    reader-only fields take the reader's default (an error if none —
    the incompatibility a registry's backward-compatibility check
    rejects at registration time); primitive promotions int→long/
    float/double, long→float/double, float→double, string↔bytes.

    Returns ops executed in writer order, then defaults:
      ("decode", out_name, writer_prim, nullable, reader_prim)
      ("skip",   writer_prim, nullable)
      ("default", out_name, value)
    """
    writer = _fields_with_defaults(writer_json)
    reader = _fields_with_defaults(reader_json)
    rmap = {name: (prim, nullable) for name, prim, nullable, _, _ in reader}
    plan: list[tuple] = []
    seen = set()
    for name, wprim, wnull, _, _ in writer:
        if name not in rmap:
            plan.append(("skip", wprim, wnull))
            continue
        rprim, rnull = rmap[name]
        # synthetic decimal:P:S primitives resolve only to themselves
        allowed = _PROMOTIONS.get(wprim, {wprim})
        if rprim not in allowed:
            raise ValueError(
                f"field {name}: cannot promote writer {wprim} to reader {rprim}"
            )
        if wnull and not rnull:
            raise ValueError(
                f"field {name}: writer is nullable but reader is not"
            )
        plan.append(("decode", name, wprim, wnull, rprim))
        seen.add(name)
    for name, rprim, rnull, has_default, default in reader:
        if name in seen:
            continue
        if not has_default:
            raise ValueError(
                f"reader field {name} missing from writer schema and has no"
                " default — schemas are not backward compatible"
            )
        if default is None and not rnull and rprim != "null":
            raise ValueError(f"reader field {name}: null default on non-nullable")
        plan.append(("default", name, default))
    return plan


def _skip_value(buf, pos: int, prim: str) -> int:
    if prim in ("int", "long"):
        _, pos = _read_long(buf, pos)
    elif prim in ("string", "bytes") or prim.startswith("decimal:"):
        n, pos = _read_long(buf, pos)
        pos += n
    elif prim == "double":
        pos += 8
    elif prim == "float":
        pos += 4
    elif prim == "boolean":
        pos += 1
    elif prim == "null":
        pass
    else:
        raise ValueError(f"unsupported avro primitive: {prim}")
    return pos


def decode_record_resolved(buf: bytes, plan: list[tuple]) -> dict:
    """Decode a writer-encoded body through a ``resolve_schemas``
    plan → dict shaped like the reader schema."""
    pos = 0
    row: dict = {}
    for op in plan:
        if op[0] == "default":
            _, name, default = op
            row[name] = default
            continue
        if op[0] == "skip":
            _, prim, nullable = op
            if nullable:
                branch, pos = _read_long(buf, pos)
                if branch == 0:
                    continue
            pos = _skip_value(buf, pos, prim)
            continue
        _, name, wprim, nullable, rprim = op
        if nullable:
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                row[name] = None
                continue
        if wprim in ("int", "long"):
            v, pos = _read_long(buf, pos)
            row[name] = float(v) if rprim in ("float", "double") else v
        elif wprim.startswith("decimal:"):
            import decimal as _dec

            scale = int(wprim.split(":")[2])
            n, pos = _read_long(buf, pos)
            unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
            pos += n
            row[name] = _dec.Decimal(unscaled).scaleb(-scale)
        elif wprim == "string":
            n, pos = _read_long(buf, pos)
            raw = bytes(buf[pos : pos + n])
            pos += n
            row[name] = raw if rprim == "bytes" else raw.decode("utf-8")
        elif wprim == "bytes":
            n, pos = _read_long(buf, pos)
            raw = bytes(buf[pos : pos + n])
            pos += n
            row[name] = raw.decode("utf-8") if rprim == "string" else raw
        elif wprim == "double":
            (row[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif wprim == "float":
            (v,) = struct.unpack_from("<f", buf, pos)
            pos += 4
            row[name] = v
        elif wprim == "boolean":
            row[name] = buf[pos] != 0
            pos += 1
        elif wprim == "null":
            row[name] = None
        else:
            raise ValueError(f"unsupported avro primitive: {wprim}")
    return row


def avro_decode_evolved(
    df: DataFrame,
    writer_schemas: dict[int, str],
    reader_schema: str,
    value_col: str = "value",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Registry-consumer decode under SCHEMA EVOLUTION: each payload's
    Confluent frame names its writer schema by id (the registry
    lookup); the body is decoded against that writer schema RESOLVED
    to the fixed ``reader_schema`` — so one stream can interleave
    records produced before and after a compatible schema change
    (field added with default, field dropped, int widened to long...)
    and every row comes out in the reader's shape. Unknown schema ids
    raise, like a consumer whose registry lacks the id."""
    plans = {
        sid: resolve_schemas(w_json, reader_schema)
        for sid, w_json in writer_schemas.items()
    }
    decoded_schema = spark_schema_for(reader_schema)
    kept = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(list(kept) + list(decoded_schema.fields))
    decoded_names = [f.name for f in decoded_schema.fields]

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[value_col]:
                sid, body = strip_confluent_frame(bytes(payload))
                plan = plans.get(sid)
                if plan is None:
                    raise ValueError(f"unknown schema id {sid} (not in registry)")
                rows.append(decode_record_resolved(body, plan))
            decoded = pd.DataFrame(rows, columns=decoded_names)
            for c in reversed(keep_cols):
                decoded.insert(0, c, pdf[c].reset_index(drop=True))
            yield decoded

    return df.select(*keep_cols, value_col).mapInPandas(_dec, out_schema)


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
