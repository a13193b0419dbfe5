"""StreamOpSpec — the engine's pluggable operator surface.

Graft of the reference's ``DataflowSpec`` trait
(``utils/src/dataflow_spec.rs:5-31``): an analysis there is
``{reversed?, entry, init, meet, transfer, finish}`` over a generic
lattice value; a streaming operator here is
``{order, initial_state, merge, update, finish}`` over a generic state.

The semilattice contract is inherited verbatim and is THE correctness
invariant of the whole engine (reference ``blog/blog.md:91-103``):
``merge`` must be **commutative, associative and idempotent** over
states built from disjoint row sets, and ``update`` must commute with
``merge`` up to final state equality.  That is exactly what makes
(a) partial+final aggregation across partitions safe, and
(b) idempotent epoch replay (exactly-once) safe.

Operators with ``order == "reverse"`` (the LiveVars analog, reference
``passes/src/live_vars.rs:11-13``) cannot fold incrementally under
out-of-order arrival; they set ``incremental = False`` and the runtime
buffers rows (deduped by ``offset``, a multiset-union CRDT) and folds
once, in event-time order (desc for reverse), when the watermark closes
the window.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class _Top:
    """Lattice top sentinel (the reference's ``Value::Any`` /
    ``Set::Full`` — ``passes/src/const_prop.rs:5-9``,
    ``passes/src/available_expr.rs:12-18``)."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "TOP"

    def __reduce__(self):  # pickle to the singleton
        return (_Top, ())


TOP = _Top()


class StreamOpSpec(ABC):
    """A keyed, windowed streaming operator."""

    #: registry / display name
    name: str = "op"

    #: "forward" folds rows in ascending (event_ts, offset);
    #: "reverse" in descending — reverse implies ``incremental = False``.
    order: str = "forward"

    #: if False the runtime buffers rows per (key, window) and calls
    #: ``update`` exactly once at window close with all rows in order.
    incremental: bool = True

    #: column the operator keys on
    key_column: str = "speaker_id"

    #: columns update() needs (engine prunes the rest before the shuffle)
    value_columns: tuple = ()

    @abstractmethod
    def initial_state(self) -> Any:
        """The lattice ``init`` value (reference ``dataflow_spec.rs:13-15``)."""

    @abstractmethod
    def merge(self, a: Any, b: Any) -> Any:
        """The ``meet``: combine two partial states. Semilattice laws apply."""

    @abstractmethod
    def update(self, state: Any, rows: list[dict]) -> Any:
        """The ``transfer``: fold a run of rows (already in operator order)
        into ``state`` and return the new state."""

    def finish(self, key: Any, window: tuple, state: Any) -> dict | None:
        """Project the closed-window state to an output row (reference
        ``finish`` default at ``dataflow_spec.rs:28-30``).  Return None to
        emit nothing for this (key, window)."""
        return {"key": key, "window_start": window[0], "window_end": window[1],
                "state": repr(state)}
