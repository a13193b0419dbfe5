"""Watermark clock — the graft of the reference's worklist frontier.

The reference's progress tracker is "the set of blocks whose inputs may
still change" (``impls/src/parallel.rs:27``); termination is "worklist
empty" (``impls/src/sequential.rs:27``).  Here progress is an
event-time **watermark**: after ingesting epoch ``e`` the clock is

    wm(e) = max(event_ts over epochs <= e) - allowed_lateness

A (key, window) vertex leaves the frontier (may emit, becomes immutable)
when ``wm >= window_end``.  Stream end = watermark >= max event-ts, the
analog of fixpoint termination.

Determinism contract: the watermark schedule is a pure function of the
(input stream, epoch boundaries, lateness) — NEVER of physical arrival
order inside the engine — so the oracle executor and the parallel
engine compute the identical schedule and therefore agree row-for-row
on which late rows drop and when each window closes.  This is the
analog of the reference's requirement that every executor reach the
same fixpoint (``impls/src/bin/test.rs:21-70``).
"""

from __future__ import annotations

MIN_TS = -(2**62)


class WatermarkClock:
    def __init__(self, allowed_lateness_us: int = 0):
        self.allowed_lateness_us = int(allowed_lateness_us)
        self._max_ts = MIN_TS

    def observe(self, max_event_ts_us: int) -> None:
        if max_event_ts_us > self._max_ts:
            self._max_ts = max_event_ts_us

    @property
    def watermark(self) -> int:
        if self._max_ts == MIN_TS:
            return MIN_TS
        return self._max_ts - self.allowed_lateness_us

    def is_closed(self, window_end_us: int) -> bool:
        return self.watermark >= window_end_us

    def is_late(self, ts_us: int, window_end_us: int) -> bool:
        """A row is late (dropped + counted) iff the window it belongs to
        already closed under the *previous* epoch's watermark — callers
        must check before observing the row's own epoch."""
        return self.watermark >= window_end_us
