"""Per-batch source-offset listener (T6 analog).

The reference wires an external `KafkaOffsetCommitterListener` jar so the
consumer group's committed offsets track the stream and ordinary Kafka lag
monitoring works (README.md:141, glue/cdc_redshift.py:99). This is the
in-engine analog on Spark's public listener API: after every completed
micro-batch, record each source's end offsets — durably to a JSON-lines log
for dashboards, and/or through an injectable `committer` callable (a real
deployment passes a thin Kafka-admin client that commits the offsets to the
group; no broker exists in this environment, so that client is injected,
not imported).

Offsets come from `StreamingQueryProgress.sources[*].endOffset`, which for
the Kafka source is the JSON map {topic: {partition: offset}} — exactly
what a group commit needs. Works unchanged for the file-source twin used in
tests (its endOffset is the file-stream log index).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


class OffsetCommitListener(StreamingQueryListener):
    def __init__(
        self,
        log_path: str | None = None,
        committer: Callable[[dict], None] | None = None,
    ):
        self.log_path = log_path
        self.committer = committer
        self.records: list[dict] = []
        self._lock = threading.Lock()  # listener bus may overlap with readers

    def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "sources": [
                {
                    "description": s.description,
                    "start_offset": s.startOffset,
                    "end_offset": s.endOffset,
                    "num_input_rows": s.numInputRows,
                }
                for s in p.sources
            ],
        }
        with self._lock:
            self.records.append(rec)
            if self.log_path:
                os.makedirs(os.path.dirname(self.log_path) or ".", exist_ok=True)
                with open(self.log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        if self.committer is not None:
            self.committer(rec)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def last_offsets(self) -> dict | None:
        """Most recent per-source end offsets (lag-monitoring probe)."""
        with self._lock:
            if not self.records:
                return None
            rec = self.records[-1]
        return {
            s["description"]: s["end_offset"] for s in rec["sources"]
        }
