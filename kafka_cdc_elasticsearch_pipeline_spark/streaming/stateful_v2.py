"""The same per-user profile operator on Spark 4's NEW stateful API —
``transformWithStateInPandas`` (SPARK-49770, the successor to
``applyInPandasWithState``): typed per-key state handles
(ValueState/ListState/MapState), explicit processor lifecycle, timer
support, and state-schema evolution.

Both implementations run in the gate against the SAME DuckDB oracle,
which pins an engine-level claim: the operator contract (deterministic
per-key fold with tie-broken last-event tracking) is API-independent —
migrating a 100 TB pipeline from the old stateful API to the new one
must not change a single output hash.

Scale notes match ``stateful.py``: one fixed-width ValueState row per
key in the state store (RocksDB at scale), Arrow-batched pandas I/O,
event time as int64 epoch-micros end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from kafka_cdc_elasticsearch_pipeline_spark.compat import ensure_protobuf

# The v2 state protocol needs google.protobuf; install the vendored-copy
# shim if the pip package is absent. Import-time so Spark workers that
# unpickle these processor classes get it before the API client's lazy
# StateMessage_pb2 imports run (see compat/protobuf_shim.py).
PROTOBUF_OK = ensure_protobuf()

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def require_protobuf() -> None:
    """Fail LOUDLY when the v2 API can't run — a silent fallback to the
    old API would defeat the hash-equality claim the gate row exists
    to test."""
    if not PROTOBUF_OK and not ensure_protobuf():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf and neither "
            "the pip package nor a vendorable pure-python copy is present "
            "(see compat/protobuf_shim.py). Refusing to silently fall back "
            "to applyInPandasWithState."
        )


class rocksdb_state_store:
    """Context manager: transformWithState requires the RocksDB state
    store provider (multiple column families — one per state variable
    plus timers); set it for the streaming run, restore after."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"

    def __init__(self, spark) -> None:
        self._spark = spark
        self._old: str | None = None

    def __enter__(self):
        try:
            self._old = self._spark.conf.get(self._KEY)
        except Exception:
            self._old = None
        self._spark.conf.set(self._KEY, _ROCKSDB_PROVIDER)
        return self

    def __exit__(self, *exc) -> None:
        if self._old is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._old)

from kafka_cdc_elasticsearch_pipeline_spark.streaming.stateful import (
    PROFILE_OUTPUT_SCHEMA,
    PROFILE_STATE_SCHEMA,
)


class ProfileProcessor(StatefulProcessor):
    """Per-user profile: (event count, integer unit total, last event
    by (ts, event_id) tiebreak) — identical fold as the old-API twin."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", PROFILE_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = self._state.get() if self._state.exists() else None
        n, units, ts_us, eid, val = cur if cur is not None else (0, 0, -1, -1, 0.0)
        for pdf in rows:
            n += len(pdf)
            units += int(pdf["units"].sum())
            latest = pdf[pdf["ts_us"] == pdf["ts_us"].max()]
            row = latest.loc[latest["event_id"].idxmax()]
            if (int(row["ts_us"]), int(row["event_id"])) > (ts_us, eid):
                ts_us, eid, val = (
                    int(row["ts_us"]),
                    int(row["event_id"]),
                    float(row["value"]),
                )
        self._state.update((n, units, ts_us, eid, val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_units": [units],
                "last_ts_us": [ts_us],
                "last_event_id": [eid],
                "last_value": [val],
            }
        )

    def close(self) -> None:
        pass


class LatestPerKeyTTLProcessor(StatefulProcessor):
    """TTL latest-per-key on the new API: same fold and eviction
    contract as ``stateful.latest_per_key_ttl_stream``, with the TTL
    expressed through the v2 TIMER primitives (registerTimer /
    handleExpiredTimer) instead of GroupStateTimeout — one live timer
    per key, replaced on every update, state cleared when it fires."""

    def __init__(self, ttl_ms: int) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        from kafka_cdc_elasticsearch_pipeline_spark.streaming.stateful import (
            LATEST_TTL_STATE_SCHEMA,
        )

        self._handle = handle
        self._state = handle.getValueState("latest", LATEST_TTL_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = self._state.get() if self._state.exists() else None
        ts_us, eid, etype, val, props = (
            cur if cur is not None else (-1, -1, "", 0.0, "")
        )
        for pdf in rows:
            latest = pdf[pdf["ts_us"] == pdf["ts_us"].max()]
            row = latest.loc[latest["event_id"].idxmax()]
            if (int(row["ts_us"]), int(row["event_id"])) > (ts_us, eid):
                ts_us, eid = int(row["ts_us"]), int(row["event_id"])
                etype, val, props = (
                    str(row["event_type"]), float(row["value"]), str(row["props"])
                )
        self._state.update((ts_us, eid, etype, val, props))
        # exactly one live timer per key: replace on every update
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        wm = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(max(ts_us // 1000 + self._ttl_ms, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [eid],
                "ts_us": [ts_us],
                "event_type": [etype],
                "value": [val],
                "props": [props],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # TTL eviction: every update was already emitted, so dropping
        # the state row loses nothing; the key re-enters from scratch.
        self._state.clear()
        return iter([])

    def close(self) -> None:
        pass


def latest_per_key_ttl_stream_v2(
    events: DataFrame,
    ttl: str = "2 hours",
    watermark: str = "0 seconds",
    key_col: str = "user_id",
) -> DataFrame:
    """``transformWithStateInPandas`` version of
    ``stateful.latest_per_key_ttl_stream`` — same input projection,
    same update-mode emission, timers in EventTime mode."""
    from kafka_cdc_elasticsearch_pipeline_spark.streaming.stateful import (
        LATEST_TTL_OUTPUT_SCHEMA,
        _duration_ms,
    )

    prepared = events.select(
        F.col(key_col).alias("user_id"),
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        F.col("value").cast("double").alias("value"),
        "props",
        F.col("ts").cast("timestamp").alias("_evt"),
    ).withWatermark("_evt", watermark)
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=LatestPerKeyTTLProcessor(_duration_ms(ttl)),
        outputStructType=LATEST_TTL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


def user_profile_stream_v2(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` version of
    ``stateful.user_profile_stream`` — same input projection, same
    update-mode emission."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor("value").cast("long").alias("units"),
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


class RecentEventsProcessor(StatefulProcessor):
    """Per-user top-``k`` recent events held in a typed LIST state —
    the v2 primitive the ValueState/MapState/timer gate rows don't
    touch. Each batch round-trips all three list operations:
    ``appendList`` the batch's (ts_us, event_id) pairs onto the state,
    ``get`` the grown list back, and ``put`` the trimmed top-k —
    exercising the list protocol's append/iterate/replace paths, not
    just a value row that happens to hold an array. Emits the current
    top-k ids per key; update-mode compaction keeps the last emission,
    which must equal the batch top-k by (ts, event_id) DESC."""

    def __init__(self, k: int = 3) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState(
            "recent", "ts_us bigint, event_id bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch: list[tuple[int, int]] = []
        for pdf in rows:
            batch.extend(
                (int(t), int(e))
                for t, e in zip(pdf["ts_us"], pdf["event_id"])
            )
        self._recent.appendList(batch)
        grown = [(int(r[0]), int(r[1])) for r in self._recent.get()]
        top = sorted(grown, reverse=True)[: self._k]
        self._recent.put(top)
        # recent_sort_key flattens the ranked (ts, eid) pairs: it is
        # lexicographically NON-DECREASING as more events arrive (the
        # ranked prefix only improves), so update-log compaction is
        # max_by on it — no separate monotone counter state needed.
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "recent_event_ids": [[e for _, e in top]],
                "recent_sort_key": [[x for pair in top for x in pair]],
            }
        )

    def close(self) -> None:
        pass


def recent_events_stream_v2(events: DataFrame, k: int = 3) -> DataFrame:
    """``transformWithStateInPandas`` + ListState: per-user top-``k``
    most recent event ids by (ts, event_id)."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RecentEventsProcessor(k),
        outputStructType=(
            "user_id bigint, recent_event_ids array<bigint>,"
            " recent_sort_key array<bigint>"
        ),
        outputMode="Update",
        timeMode="None",
    )


class avro_state_encoding:
    """Context manager: Avro state-store encoding — the prerequisite
    for STATE SCHEMA EVOLUTION (the UnsafeRow default is positional
    and refuses any schema change; Avro resolves old state rows
    against the new reader schema, nulling added fields). Must be on
    from the FIRST run of a query that will later evolve."""

    _KEY = "spark.sql.streaming.stateStore.encodingFormat"

    def __init__(self, spark) -> None:
        self._spark = spark
        self._old: str | None = None

    def __enter__(self):
        try:
            self._old = self._spark.conf.get(self._KEY)
        except Exception:
            self._old = None
        self._spark.conf.set(self._KEY, "avro")
        return self

    def __exit__(self, *exc) -> None:
        if self._old is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._old)


#: ProfileProcessor's state plus one ADDED trailing field — the shape
#: of a live migration: ``units_plus_n`` is derivable from the fields
#: that were always tracked, so the evolved processor can BACKFILL it
#: on first touch of a pre-evolution key and the final output stays
#: independent of where the schema change happened.
#: Field names must MATCH the v1 schema exactly — Avro resolves state
#: rows by name, so a renamed field silently reads as null (verified:
#: naming these ``event_id``/``value`` nulled the old rows' values).
EVOLVED_PROFILE_STATE_SCHEMA = PROFILE_STATE_SCHEMA + ", units_plus_n bigint"


class EvolvedProfileProcessor(StatefulProcessor):
    """ProfileProcessor after a STATE SCHEMA EVOLUTION: same fold,
    state widened by a trailing ``units_plus_n`` column. Old 5-field
    state rows written before the evolution decode under the 6-field
    reader schema with the added field null (Avro resolution); the
    processor backfills it from the surviving fields and maintains it
    incrementally afterwards.

    The invariant ``units_plus_n == n + units`` is checked on every
    read: a violated backfill (wrong default, field misalignment,
    stale decode) POISONS ``n_events`` so the gate row's hash check
    against the batch oracle fails loudly instead of silently passing
    on the 5 unchanged columns."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", EVOLVED_PROFILE_STATE_SCHEMA
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = self._state.get() if self._state.exists() else None
        if cur is None:
            n, units, ts_us, eid, val = 0, 0, -1, -1, 0.0
        else:
            n, units, ts_us, eid, val = (
                int(cur[0]), int(cur[1]), int(cur[2]), int(cur[3]),
                float(cur[4]),
            )
            combo = cur[5]
            if combo is None:
                combo = n + units  # pre-evolution row: backfill
            if int(combo) != n + units:
                n = -(10**15)  # poison: evolution mangled the state
        for pdf in rows:
            n += len(pdf)
            units += int(pdf["units"].sum())
            latest = pdf[pdf["ts_us"] == pdf["ts_us"].max()]
            row = latest.loc[latest["event_id"].idxmax()]
            if (int(row["ts_us"]), int(row["event_id"])) > (ts_us, eid):
                ts_us, eid, val = (
                    int(row["ts_us"]),
                    int(row["event_id"]),
                    float(row["value"]),
                )
        self._state.update((n, units, ts_us, eid, val, n + units))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_units": [units],
                "last_ts_us": [ts_us],
                "last_event_id": [eid],
                "last_value": [val],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream_v2_evolved(events: DataFrame) -> DataFrame:
    """The evolved-schema twin of :func:`user_profile_stream_v2` —
    same projection and output schema, state widened by one field.
    Restart THIS builder over the checkpoint the original wrote (under
    :class:`avro_state_encoding`) to exercise state schema evolution."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor("value").cast("long").alias("units"),
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EvolvedProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


class EventTypeCountsProcessor(StatefulProcessor):
    """Per-user MAP state on the v2 API: one MapState entry per event
    type holding its running count — the state shape ksqlDB gives a
    `GROUP BY user_id, event_type` table, expressed with the new
    API's typed map primitive instead of a flat composite key. Pins
    the v2 MapState protocol (getValue/updateValue round-trips through
    the state server) the way the ValueState rows pin value state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "etype_counts", "event_type string", "n bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        local: dict[str, int] = {}
        for pdf in rows:
            for et in pdf["event_type"]:
                s = str(et)
                local[s] = local.get(s, 0) + 1
        out = []
        for et in sorted(local):
            cur = (
                self._counts.getValue((et,))
                if self._counts.containsKey((et,))
                else None
            )
            n = (int(cur[0]) if cur is not None else 0) + local[et]
            self._counts.updateValue((et,), (n,))
            out.append((key[0], et, n))
        yield pd.DataFrame(out, columns=["user_id", "event_type", "n_events"])

    def close(self) -> None:
        pass


def event_type_counts_stream_v2(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` + MapState: per-(user, event
    type) running counts, emitted in update mode — reduce with max()
    per pair (counts are monotone) to materialize the final table."""
    prepared = events.select("user_id", "event_type")
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EventTypeCountsProcessor(),
        outputStructType="user_id bigint, event_type string, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )
