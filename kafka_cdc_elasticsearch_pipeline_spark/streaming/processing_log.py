"""Processing log (SURVEY §2.9 T9): ksqlDB auto-creates a processing-
log topic recording per-query runtime events; the Spark twin is a
``StreamingQueryListener`` capturing progress/start/termination.

Attach with ``ProcessingLog.attach(spark)``; every micro-batch's
progress lands in ``entries`` (bounded ring buffer) and can be drained
to any sink — the 100 TB deployment would forward to Kafka/ES exactly
like the reference's log topic.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProcessingLog(StreamingQueryListener):
    """Ring-buffer processing log for streaming queries."""

    def __init__(self, max_entries: int = 1000) -> None:
        self.entries: deque[dict] = deque(maxlen=max_entries)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.entries.append(
            {"type": "started", "id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.entries.append(
            {
                "type": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.entries.append(
            {"type": "terminated", "id": str(event.id), "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # ---------------------------------------------------------------------
    @classmethod
    def attach(cls, spark: SparkSession, max_entries: int = 1000) -> "ProcessingLog":
        log = cls(max_entries)
        spark.streams.addListener(log)
        return log

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)
