"""Strict count-or-timeout batcher (reference operator K2) on Spark 4's
arbitrary-state v2 API (``transformWithStateInPandas`` /
``StatefulProcessor``) — same protocol as ``batcher.py``'s
``applyInPandasWithState`` version:

- count flush at ``batch_size`` (``InvoiceResponseBatchProcessor.java:130``);
- timeout drain when a processing-time timer fires ``timeout_ms`` after the
  last flush-or-arrival (``:159-183``);
- max-wait force flush on arrival (``:229-248``).

Why both implementations exist: v1 (``GroupState``) is the widely-deployed
API; v2 is where Spark streaming state is going — typed state variables
(the buffer is a real ``ListState``, not a re-serialized blob: appends
don't rewrite the whole buffer), explicitly managed timers (register /
delete, multiple per key) and state TTL.  At 100 TB-of-stream scale the
``ListState.appendList`` incremental write is the difference between O(1)
and O(buffer) state-store I/O per micro-batch.

Semantics parity between the two is pinned by ``tests/test_batcher_v2.py``:
the flush protocol is tested directly against the processor with in-memory
state doubles (pure Python — full branch coverage), and the end-to-end
streaming tests run whenever the environment can (``transformWithState``'s
state-server protocol needs ``google.protobuf``, which this container does
not ship — the e2e tests ``importorskip`` on it, same honest-gating policy
as the multimodal codec backends).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .batcher import BATCH_OUTPUT_SCHEMA, FLUSH_COUNT, FLUSH_FORCE, FLUSH_TIMEOUT

_NO_TIMER = -1


class CountOrTimeoutProcessor(StatefulProcessor):
    """Per-key buffer + flush protocol as a v2 stateful processor.

    State variables:
      - ``buffer``  (ListState[payload STRING]) — appended incrementally;
      - ``meta``    (ValueState[last_flush_ms, batch_seq, timer_ms]) —
        ``timer_ms`` tracks the one armed timer so re-arming can delete it
        (v2 timers persist until they fire; the reference's are one-shot,
        ``InvoiceResponseTimerManager.java:27-57``).
    """

    def __init__(
        self,
        batch_size: int,
        timeout_ms: int,
        max_wait_ms: int | None,
        remove_state_when_empty: bool,
    ) -> None:
        self._batch_size = batch_size
        self._timeout_ms = timeout_ms
        self._max_wait_ms = max_wait_ms
        self._remove_empty = remove_state_when_empty

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._buffer = handle.getListState("buffer", "payload STRING")
        self._meta = handle.getValueState(
            "meta", "last_flush_ms LONG, batch_seq LONG, timer_ms LONG"
        )

    # -- helpers ----------------------------------------------------------

    def _load(self, now_ms: int) -> tuple[list[str], int, int, int]:
        meta = self._meta.get()
        if meta is None:
            return [], now_ms, 0, _NO_TIMER
        buffer = [t[0] for t in self._buffer.get()]
        return buffer, meta[0], meta[1], meta[2]

    def _store(
        self,
        key: Any,
        buffer: list[str],
        last_flush: int,
        seq: int,
        timer_ms: int,
        now_ms: int,
        append_only: list[str] | None = None,
    ) -> None:
        if timer_ms != _NO_TIMER:
            self._handle.deleteTimer(timer_ms)
            timer_ms = _NO_TIMER
        if not buffer and self._remove_empty:
            self._buffer.clear()
            self._meta.clear()
            return
        if append_only is not None and buffer:
            # no flush consumed a prefix this invocation: the stored list
            # is still a prefix of `buffer`, so append ONLY the newly
            # arrived rows — the O(1)-per-row path that is the point of
            # the v2 API.  A full clear+put here made state I/O O(buffer)
            # per micro-batch for every quietly-filling key.
            if append_only:
                self._buffer.appendList([(p,) for p in append_only])
            timer_ms = now_ms + self._timeout_ms
            self._handle.registerTimer(timer_ms)
        else:
            self._buffer.clear()
            if buffer:
                self._buffer.put([(p,) for p in buffer])
                timer_ms = now_ms + self._timeout_ms
                self._handle.registerTimer(timer_ms)
        self._meta.update((last_flush, seq, timer_ms))

    @staticmethod
    def _out(
        key: Any, seq: int, flushed: list[tuple[str, list[str]]]
    ) -> Iterator[pd.DataFrame]:
        if flushed:
            yield pd.DataFrame(
                {
                    "key": ["_".join(str(k) for k in key)] * len(flushed),
                    "batch_seq": [seq + i for i in range(len(flushed))],
                    "item_count": [len(p) for _, p in flushed],
                    "flush_reason": [r for r, _ in flushed],
                    "payloads": [p for _, p in flushed],
                }
            )

    # -- protocol ---------------------------------------------------------

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        buffer, last_flush, seq, timer_ms = self._load(now_ms)

        arrived: list[str] = []
        for pdf in rows:
            arrived.extend(pdf["payload"].astype(str).tolist())
        buffer.extend(arrived)

        flushed: list[tuple[str, list[str]]] = []
        if (
            buffer
            and self._max_wait_ms is not None
            and now_ms - last_flush >= self._max_wait_ms
        ):
            flushed.append((FLUSH_FORCE, buffer))
            buffer = []
            last_flush = now_ms
        while len(buffer) >= self._batch_size:
            flushed.append((FLUSH_COUNT, buffer[: self._batch_size]))
            buffer = buffer[self._batch_size :]
            last_flush = now_ms

        self._store(
            key, buffer, last_flush, seq + len(flushed), timer_ms, now_ms,
            append_only=arrived if not flushed else None,
        )
        yield from self._out(key, seq, flushed)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        buffer, _last_flush, seq, _timer = self._load(now_ms)
        flushed: list[tuple[str, list[str]]] = []
        if buffer:
            flushed.append((FLUSH_TIMEOUT, buffer))
            buffer = []
        # the fired timer is already gone; don't delete it again
        self._store(key, buffer, now_ms, seq + len(flushed), _NO_TIMER, now_ms)
        yield from self._out(key, seq, flushed)

    def close(self) -> None:
        pass


def count_or_timeout_batches_v2(
    df: DataFrame,
    key_cols: list[str],
    batch_size: int = 100,
    timeout_ms: int = 3000,
    max_wait_ms: int | None = 6000,
    payload_col: str = "payload",
    remove_state_when_empty: bool = False,
) -> DataFrame:
    """v2-API twin of :func:`batcher.count_or_timeout_batches` — identical
    protocol and output schema (:data:`BATCH_OUTPUT_SCHEMA`).

    Requires ``google.protobuf`` (the state-v2 Python↔JVM state-server
    protocol rides protobuf messages).  Checked eagerly here: without the
    gate a missing protobuf only surfaces as an async worker crash deep
    inside the running stream."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas (state v2) requires google.protobuf; "
            "install protobuf, or use streaming.batcher."
            "count_or_timeout_batches (applyInPandasWithState), which is "
            "protocol-identical"
        ) from e
    sel = df.select(*key_cols, df[payload_col].alias("payload"))
    return sel.groupBy(*key_cols).transformWithStateInPandas(
        CountOrTimeoutProcessor(
            batch_size, timeout_ms, max_wait_ms, remove_state_when_empty
        ),
        outputStructType=BATCH_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
