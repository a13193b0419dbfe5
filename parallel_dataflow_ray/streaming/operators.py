"""Per-partition stateful operators (the engine's actor payloads).

Each operator owns the state for one hash partition of the key space —
the graft of the reference's per-CFG ``in_vals``/``out_vals`` arrays
owned by one thread (``impls/src/parallel.rs:24-25``) — and exposes the
chassis interface the partition actor drives:

    apply(table, wm_prev)      ingest one epoch's rows for this partition
    on_watermark(wm) -> rows   close + emit everything the frontier passed
    snapshot()/restore(bytes)  per-partition checkpoint payload

State layout for fixed windows: hash-map keyed ``(key, window)`` plus a
min-heap of window end-times for eviction (north_star: "windowed
hash-aggregate (hash-map keyed by (clip_id-hash, window_id) with
min-heap watermark eviction)").
"""

from __future__ import annotations

import heapq
import pickle
from typing import Any

import numpy as np
import pyarrow as pa

from .spec import StreamOpSpec
from .windows import SessionWindows


def _rows_of(table: pa.Table) -> list[dict]:
    return table.to_pylist()


def _sort_rows(rows: list[dict], reverse: bool) -> list[dict]:
    return sorted(rows, key=lambda r: (r["event_ts"], r["offset"]), reverse=reverse)


def _window_runs(table: pa.Table, spec, assigner, ts_column: str,
                 wm_prev: int):
    """Vectorized (key, window) run-grouping shared by the partition
    fast path and the map-side combiner: assign every non-late row to
    its covering pane(s), sort indices by (key, window), and return
    ``(sorted_tbl, runs, kcodes, kuniq, late)`` with ``runs`` =
    ``[(kcode, window, start, end)]`` over ``sorted_tbl`` slices and
    ``late`` the per-input-row late mask (tumbling: the row's single
    pane closed; sliding: even its NEWEST pane closed — matching the
    row path's "no pane accepted")."""
    import pandas as pd

    n = table.num_rows
    ts = table[ts_column].cast(pa.int64()).to_numpy()
    size = assigner.size_us
    keys = table[spec.key_column].to_pylist()
    kcodes, kuniq = pd.factorize(np.asarray(keys, dtype=object))
    if assigner.kind == "tumbling":
        idx = np.arange(n)
        ws = (ts // size) * size
        late = wm_prev >= ws + size
        keep = ~late
        idx, ws = idx[keep], ws[keep]
    else:
        slide = assigner.slide_us
        n_panes = (size - 1) // slide + 1
        last = (ts // slide) * slide
        late = wm_prev >= last + size
        idxs, wss = [], []
        for j in range(n_panes):
            s = last - j * slide
            m = (~late) & (ts < s + size) & (wm_prev < s + size)
            sel = np.nonzero(m)[0]
            idxs.append(sel)
            wss.append(s[sel])
        idx = np.concatenate(idxs)
        ws = np.concatenate(wss)
    if idx.size == 0:
        return None, [], kcodes, kuniq, late
    kc = kcodes[idx]
    order = np.lexsort((ws, kc))
    idx_s, kc_s, ws_s = idx[order], kc[order], ws[order]
    sorted_tbl = table.take(pa.array(idx_s))
    # run boundaries where (key, window) changes
    change = np.empty(idx_s.size, dtype=bool)
    change[0] = True
    np.logical_or(np.diff(kc_s) != 0, np.diff(ws_s) != 0, out=change[1:])
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], idx_s.size)
    runs = [(int(kc_s[s]), (int(ws_s[s]), int(ws_s[s]) + size), int(s), int(e))
            for s, e in zip(starts, ends)]
    return sorted_tbl, runs, kcodes, kuniq, late


def combine_window_block(table: pa.Table, spec, assigner, ts_column: str,
                         wm_prev: int, num_partitions: int,
                         capture_late: bool = False) -> list[dict]:
    """Map-side combiner (shuffle-map body in combine mode): fold one
    input block's rows into per-(key, window) PARTIAL states and route
    them by key hash, so only partials — not raw rows/payload bytes —
    enter the object store.  Legal exactly when salted-key splitting is
    legal: ``spec.merge`` over states built from disjoint row subsets
    (the semilattice contract, spec.py).  Returns one payload dict per
    partition: ``{"partials": [(key, window, state)], "rows": routed
    row count (late included), "late": routed late count,
    "max_offset": max routed offset or -1}`` — the same per-partition
    accounting the row path produces."""
    from .partitioning import partition_ids

    sorted_tbl, runs, kcodes, kuniq, late = _window_runs(
        table, spec, assigner, ts_column, wm_prev)
    upids = (partition_ids(list(kuniq), num_partitions)
             if len(kuniq) else np.empty(0, np.int64))
    payloads = [{"partials": [], "rows": 0, "late": 0, "max_offset": -1}
                for _ in range(num_partitions)]
    if table.num_rows:
        row_pid = upids[kcodes]
        offsets = table["offset"].to_numpy(zero_copy_only=False)
        rows_p = np.bincount(row_pid, minlength=num_partitions)
        late_p = np.bincount(row_pid[late], minlength=num_partitions)
        mo = np.full(num_partitions, -1, dtype=np.int64)
        np.maximum.at(mo, row_pid, offsets)
        for p in range(num_partitions):
            payloads[p]["rows"] = int(rows_p[p])
            payloads[p]["late"] = int(late_p[p])
            payloads[p]["max_offset"] = int(mo[p])
        if capture_late and late.any():
            # dead-letter capture: ship the late ROWS (not just counts)
            # to their owning partition for the side-output sink
            lidx = np.nonzero(late)[0]
            lpid = row_pid[late]
            for p in range(num_partitions):
                sel = lidx[lpid == p]
                if sel.size:
                    payloads[p]["late_tbl"] = table.take(pa.array(sel))
    for kc, w, s, e in runs:
        state = spec.update_table(spec.initial_state(),
                                  sorted_tbl.slice(s, e - s))
        payloads[int(upids[kc])]["partials"].append((kuniq[kc], w, state))
    return payloads


class WindowedAggregateOp:
    """Tumbling/sliding windowed aggregate over a ``StreamOpSpec``."""

    def __init__(self, spec: StreamOpSpec, assigner, ts_column: str = "event_ts",
                 partial_keys: frozenset = frozenset()):
        assert assigner.kind in ("tumbling", "sliding")
        self.spec = spec
        self.assigner = assigner
        self.ts_column = ts_column
        #: salted hot keys: this partition holds only a PARTIAL state for
        #: them; at window close it emits the state for owner-side merge
        #: instead of finishing locally (skew splitting, SURVEY §4 —
        #: valid because ``spec.merge`` is a semilattice combine)
        self.partial_keys = frozenset(partial_keys)
        self.states: dict[tuple, Any] = {}      # (key, window) -> state | {offset: row}
        self.heap: list[tuple[int, Any, tuple]] = []  # (end, key, window)
        self.live: set[tuple] = set()
        self.late_rows = 0
        self.rows_seen = 0
        #: dead-letter side output: when True (set by the worker when a
        #: late_root is configured) late rows are BUFFERED per epoch and
        #: drained via take_late() into an epoch-idempotent side sink
        #: instead of only being counted
        self.capture_late = False
        self._late_tbls: list[pa.Table] = []

    def apply(self, table: pa.Table, wm_prev: int) -> None:
        if table.num_rows == 0:
            return
        spec = self.spec
        if (spec.incremental and hasattr(spec, "update_table")
                and self.assigner.kind in ("tumbling", "sliding")):
            self._apply_vectorized(table, wm_prev)
            return
        key_col = table[spec.key_column].to_pylist()
        ts = table[self.ts_column].cast(pa.int64()).to_numpy()
        windows = self.assigner.assign_many(ts)
        rows = _rows_of(table)
        self.rows_seen += len(rows)
        groups: dict[tuple, list[dict]] = {}
        late_idx: list[int] = []
        for i, (row, key, t, wins) in enumerate(zip(rows, key_col, ts,
                                                    windows)):
            row["event_ts"] = int(t)  # normalize timestamps to int64 us
            accepted = False
            for w in wins:
                if wm_prev >= w[1]:
                    continue  # window already closed -> late for this pane
                accepted = True
                groups.setdefault((key, w), []).append(row)
            if not accepted:
                self.late_rows += 1
                late_idx.append(i)
        if self.capture_late and late_idx:
            self._late_tbls.append(table.take(pa.array(late_idx)))
        for (key, w), grp in groups.items():
            kw = (key, w)
            if kw not in self.states:
                self.states[kw] = spec.initial_state() if spec.incremental else {}
                heapq.heappush(self.heap, (w[1], key, w))
                self.live.add(kw)
            if spec.incremental:
                self.states[kw] = spec.update(self.states[kw], _sort_rows(grp, False))
            else:
                buf = self.states[kw]
                for row in grp:
                    buf[row["offset"]] = row  # offset-keyed -> idempotent re-ingest

    def _apply_vectorized(self, table: pa.Table, wm_prev: int) -> None:
        """Tumbling/sliding fast path for incremental specs exposing
        ``update_table``: numpy grouping by (key, window) + one Arrow
        slice per group — no per-row dict conversion in the hot loop.
        Sliding replicates row INDICES per covering pane (ceil(size/
        slide) panes) before the same run-grouping — the batch-layer
        ``explode_sliding`` shape, kept columnar."""
        import heapq as _hq

        spec = self.spec
        self.rows_seen += table.num_rows
        sorted_tbl, runs, _, kuniq, late = _window_runs(
            table, spec, self.assigner, self.ts_column, wm_prev)
        self.late_rows += int(late.sum())
        if self.capture_late and late.any():
            self._late_tbls.append(table.take(pa.array(np.nonzero(late)[0])))
        for kc, w, s, e in runs:
            key = kuniq[kc]
            kw = (key, w)
            if kw not in self.states:
                self.states[kw] = spec.initial_state()
                _hq.heappush(self.heap, (w[1], key, w))
                self.live.add(kw)
            self.states[kw] = spec.update_table(self.states[kw],
                                                sorted_tbl.slice(s, e - s))

    def ingest_partials(self, payload: dict) -> None:
        """Map-side-combined ingest: merge per-(key, window) partial
        states produced by :func:`combine_window_block` (the same
        ``spec.merge`` the salted-key owner path relies on), plus the
        block's routed row/late accounting.  A partial's window can
        never already be closed here: the split evaluated lateness with
        this epoch's ``wm_prev``, and watermarks are monotone."""
        import heapq as _hq

        self.rows_seen += payload["rows"]
        self.late_rows += payload["late"]
        lt = payload.get("late_tbl")
        if lt is not None and self.capture_late:
            self._late_tbls.append(lt)
        spec = self.spec
        for key, w, state in payload["partials"]:
            kw = (key, w)
            cur = self.states.get(kw)
            if cur is None:
                self.states[kw] = state
                _hq.heappush(self.heap, (w[1], key, w))
                self.live.add(kw)
            else:
                self.states[kw] = spec.merge(cur, state)

    def on_watermark(self, wm: int) -> list[dict]:
        rows, partials = self.on_watermark_split(wm)
        if partials:  # single-process path (oracle): merge locally
            groups: dict[tuple, list] = {}
            for key, w, s in partials:
                groups.setdefault((key, w), []).append(s)
            rows = rows + self.merge_partials(groups)
        return rows

    def on_watermark_split(self, wm: int) -> tuple[list[dict], list[tuple]]:
        """Close windows the frontier passed.  Returns (finished rows,
        partial-state records for salted keys: [(key, window, state)])."""
        out: list[dict] = []
        partials: list[tuple] = []
        spec = self.spec
        while self.heap and self.heap[0][0] <= wm:
            end, key, w = heapq.heappop(self.heap)
            kw = (key, w)
            if kw not in self.live:
                continue
            self.live.discard(kw)
            state = self.states.pop(kw)
            if key in self.partial_keys:
                # ship the raw partial (buffer for non-incremental specs —
                # the owner folds the UNION in full event order)
                partials.append((key, w, state))
                continue
            if not spec.incremental:
                rows = _sort_rows(list(state.values()), spec.order == "reverse")
                state = spec.update(spec.initial_state(), rows)
            row = spec.finish(key, w, state)
            if row is not None:
                out.append(row)
        return out, partials

    def merge_partials(self, groups: dict[tuple, list[Any]]) -> list[dict]:
        """Owner-side merge of salted partial states: {(key, window):
        [state, ...]} -> finished rows.  For buffered (non-incremental)
        specs the partials arrive as offset->row buffers and are folded
        here in full event order."""
        spec = self.spec
        out = []
        for (key, w), states in sorted(groups.items(),
                                       key=lambda kv: (kv[0][1], str(kv[0][0]))):
            if not spec.incremental:
                buf: dict = {}
                for s in states:
                    buf.update(s)
                rows = _sort_rows(list(buf.values()), spec.order == "reverse")
                merged = spec.update(spec.initial_state(), rows)
            else:
                merged = states[0]
                for s in states[1:]:
                    merged = spec.merge(merged, s)
            row = spec.finish(key, w, merged)
            if row is not None:
                out.append(row)
        return out

    def take_late(self) -> pa.Table | None:
        """Drain this epoch's captured late rows (dead-letter side
        output).  Called by the worker once per epoch, BEFORE the
        checkpoint — the buffer is per-epoch transient, so snapshots
        never carry it and replay re-captures deterministically."""
        if not self._late_tbls:
            return None
        t = (self._late_tbls[0] if len(self._late_tbls) == 1
             else pa.concat_tables(self._late_tbls, promote_options="default"))
        self._late_tbls = []
        return t

    # -- checkpoint --------------------------------------------------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {"states": self.states, "heap": self.heap, "live": self.live,
             "late_rows": self.late_rows, "rows_seen": self.rows_seen},
            protocol=pickle.HIGHEST_PROTOCOL)

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.states, self.heap, self.live = d["states"], d["heap"], d["live"]
        self.late_rows, self.rows_seen = d["late_rows"], d["rows_seen"]


class SessionAggregateOp:
    """Session windows: per-key interval merging of partial sessions.

    A row opens the interval ``[ts, ts+gap)``; overlapping intervals for
    the same key merge (and their states merge via ``spec.merge`` —
    legal because merge is a semilattice combine).  A session closes
    when the watermark passes its end.
    """

    def __init__(self, spec: StreamOpSpec, assigner: SessionWindows,
                 ts_column: str = "event_ts"):
        self.spec = spec
        self.gap_us = assigner.gap_us
        self.ts_column = ts_column
        # key -> sorted list of [start, end, state_or_buffer]
        self.sessions: dict[Any, list[list]] = {}
        self.late_rows = 0
        self.rows_seen = 0
        self.capture_late = False           # dead-letter side output
        self._late_tbls: list[pa.Table] = []

    take_late = WindowedAggregateOp.take_late

    def _mk_state(self, rows: list[dict]):
        if self.spec.incremental:
            return self.spec.update(self.spec.initial_state(), _sort_rows(rows, False))
        return {r["offset"]: r for r in rows}

    def _merge_states(self, a, b):
        if self.spec.incremental:
            return self.spec.merge(a, b)
        a.update(b)
        return a

    def apply(self, table: pa.Table, wm_prev: int) -> None:
        """Vectorized ingest: sort the batch by (key, ts), split into
        per-key gap segments (each a partial session covering a whole
        run of rows), build ONE state per segment (``update_table`` for
        incremental specs — no per-row dicts), then interval-merge each
        segment into the key's open sessions.  Per-Python work drops
        from per-row to per-segment; semantics match the row-at-a-time
        path because session state merge is a semilattice combine."""
        import pandas as pd

        if table.num_rows == 0:
            return
        n = table.num_rows
        self.rows_seen += n
        ts = table[self.ts_column].cast(pa.int64()).to_numpy()
        late = wm_prev >= ts + self.gap_us
        self.late_rows += int(late.sum())  # its session has already closed
        if self.capture_late and late.any():
            self._late_tbls.append(table.take(pa.array(np.nonzero(late)[0])))
        keep = np.nonzero(~late)[0]
        if keep.size == 0:
            return
        tbl = table.take(pa.array(keep))
        ts = ts[keep]
        keys = tbl[self.spec.key_column].to_pylist()
        kcodes, kuniq = pd.factorize(np.asarray(keys, dtype=object))
        order = np.lexsort((ts, kcodes))
        ts_s, kc_s = ts[order], kcodes[order]
        tbl_s = tbl.take(pa.array(order))
        brk = np.empty(ts_s.size, dtype=bool)
        brk[0] = True
        np.logical_or(np.diff(kc_s) != 0, np.diff(ts_s) > self.gap_us,
                      out=brk[1:])
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], ts_s.size)
        fast = self.spec.incremental and hasattr(self.spec, "update_table")
        for s, e in zip(starts, ends):
            key = kuniq[kc_s[s]]
            seg = tbl_s.slice(s, e - s)
            if fast:
                state = self.spec.update_table(self.spec.initial_state(), seg)
            elif self.spec.incremental:
                rows = _rows_of(seg)
                for r, t in zip(rows, ts_s[s:e]):
                    r["event_ts"] = int(t)
                state = self.spec.update(self.spec.initial_state(),
                                         _sort_rows(rows, False))
            else:
                rows = _rows_of(seg)
                for r, t in zip(rows, ts_s[s:e]):
                    r["event_ts"] = int(t)
                state = {r["offset"]: r for r in rows}
            self._insert_interval(key, int(ts_s[s]),
                                  int(ts_s[e - 1]) + self.gap_us, state)

    def _insert(self, key, t: int, row: dict) -> None:
        self._insert_interval(key, t, t + self.gap_us, self._mk_state([row]))

    def _insert_interval(self, key, start: int, end: int, state) -> None:
        ivs = self.sessions.setdefault(key, [])
        # collect overlapping intervals ([s,e) overlaps [start,end) if s < end and start < e)
        keep, merged = [], [start, end, state]
        for iv in ivs:
            if iv[0] < merged[1] and merged[0] < iv[1]:
                merged[0] = min(merged[0], iv[0])
                merged[1] = max(merged[1], iv[1])
                merged[2] = self._merge_states(iv[2], merged[2])
            else:
                keep.append(iv)
        keep.append(merged)
        keep.sort(key=lambda iv: iv[0])
        self.sessions[key] = keep

    def on_watermark(self, wm: int) -> list[dict]:
        out = []
        spec = self.spec
        for key in list(self.sessions):
            remain = []
            for iv in self.sessions[key]:
                if iv[1] <= wm:
                    state = iv[2]
                    if not spec.incremental:
                        rows = _sort_rows(list(state.values()), spec.order == "reverse")
                        state = spec.update(spec.initial_state(), rows)
                    row = spec.finish(key, (iv[0], iv[1]), state)
                    if row is not None:
                        out.append(row)
                else:
                    remain.append(iv)
            if remain:
                self.sessions[key] = remain
            else:
                del self.sessions[key]
        return out

    def snapshot(self) -> bytes:
        return pickle.dumps({"sessions": self.sessions, "late_rows": self.late_rows,
                             "rows_seen": self.rows_seen}, protocol=pickle.HIGHEST_PROTOCOL)

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.sessions, self.late_rows, self.rows_seen = (
            d["sessions"], d["late_rows"], d["rows_seen"])


class SymmetricJoinOp:
    """Stateful symmetric hash join between two co-partitioned streams.

    Per-partition actor state = two hash tables keyed on ``key_column``
    (north_star: "a stateful symmetric hash join between the audio-clip
    stream and the transcript stream").  Each arriving row probes the
    opposite table and emits every pair within ``time_bound_us`` of
    event time; rows evict once the watermark guarantees no future
    match (wm >= ts + time_bound).  Partitioning both streams on the
    same key hash is what makes the per-partition tables complete —
    the Streaming-HyperCube-style co-partitioning argument.

    Input rows must carry ``__stream`` (0 = left, 1 = right).
    """

    def __init__(self, key_column: str = "clip_id", time_bound_us: int = 60_000_000,
                 left_columns: tuple = (), right_columns: tuple = (),
                 ts_column: str = "event_ts"):
        self.key_column = key_column
        self.time_bound_us = int(time_bound_us)
        self.left_columns = tuple(left_columns)
        self.right_columns = tuple(right_columns)
        self.ts_column = ts_column
        # COLUMNAR state: one pandas frame per side (key, event_ts,
        # offset, payload cols) — probes are vectorized merges, never a
        # per-row dict of the binary audio payload
        self.stores: list = [None, None]
        self.seen: tuple[set, set] = (set(), set())  # offsets per side
        self.pending: list[dict] = []  # matched this epoch, not yet collected
        self.late_rows = 0
        self.rows_seen = 0
        # output keeps the old dict-row semantics: left payload first,
        # right payload overwrites on name collision
        self._left_payload = tuple(c for c in dict.fromkeys(self.left_columns)
                                   if c not in self.right_columns)
        self._right_payload = tuple(dict.fromkeys(self.right_columns))

    def _side_cols(self, side: int) -> list[str]:
        payload = self.left_columns if side == 0 else self.right_columns
        return list(dict.fromkeys(
            [self.key_column, "event_ts", "offset", *payload]))

    def _probe(self, l, r) -> None:
        """Emit all (left, right) pairs with equal key within the time
        bound — one vectorized merge + mask per probe."""
        if l is None or r is None or len(l) == 0 or len(r) == 0:
            return
        lk = l[list(dict.fromkeys(
            [self.key_column, "event_ts", *self._left_payload]))].rename(
            columns={"event_ts": "ts_left"})
        rk = r[list(dict.fromkeys(
            [self.key_column, "event_ts", *self._right_payload]))].rename(
            columns={"event_ts": "ts_right"})
        m = lk.merge(rk, on=self.key_column)
        if m.empty:
            return
        m = m[(m["ts_left"] - m["ts_right"]).abs() <= self.time_bound_us]
        if m.empty:
            return
        cols = [self.key_column, "ts_left", "ts_right",
                *self._left_payload, *self._right_payload]
        self.pending.extend(m[cols].to_dict("records"))

    def apply(self, table: pa.Table, wm_prev: int) -> None:
        import pandas as pd

        if table.num_rows == 0:
            return
        n = table.num_rows
        self.rows_seen += n
        ts = table[self.ts_column].cast(pa.int64()).to_numpy()
        late = wm_prev >= ts + self.time_bound_us
        self.late_rows += int(late.sum())  # every possible match already evicted
        keep = np.nonzero(~late)[0]
        if keep.size == 0:
            return
        tbl = table.take(pa.array(keep))
        sides = tbl["__stream"].to_numpy(zero_copy_only=False).astype(np.int8)
        df = tbl.drop_columns(["__stream"]).to_pandas()
        df["event_ts"] = ts[keep].astype(np.int64)
        news = []
        for side in (0, 1):
            cols = [c for c in self._side_cols(side) if c in df.columns]
            sub = df.loc[sides == side, cols]
            if len(sub):
                # idempotent re-ingest (replayed epoch): offset-keyed
                sub = sub[~sub["offset"].isin(self.seen[side])]
                sub = sub.drop_duplicates("offset")
            news.append(sub)
        # pair set = new0×stored1 ∪ stored0×new1 ∪ new0×new1 — exactly the
        # pairs the row-at-a-time probe emitted, order-independent
        self._probe(news[0], self.stores[1])
        self._probe(self.stores[0], news[1])
        self._probe(news[0], news[1])
        for side in (0, 1):
            if len(news[side]) == 0:
                continue
            self.seen[side].update(map(int, news[side]["offset"]))
            st = self.stores[side]
            self.stores[side] = (news[side] if st is None
                                 else pd.concat([st, news[side]],
                                                ignore_index=True))

    def on_watermark(self, wm: int) -> list[dict]:
        out, self.pending = self.pending, []
        for side in (0, 1):
            st = self.stores[side]
            if st is None or len(st) == 0:
                continue
            # keep rows with ts + bound >= wm: a future in-order row can
            # sit EXACTLY at the bound (ts_new = wm = ts_old + bound) and
            # must still find its partner (strict > lost the boundary
            # pair when an epoch boundary fell between the two rows)
            mask = (st["event_ts"] + self.time_bound_us >= wm).to_numpy()
            if not mask.all():
                kept = st[mask].reset_index(drop=True)
                self.stores[side] = kept
                # prune the dedup set with the store: an evicted row's
                # replay either hits the late check (live runs use the
                # current watermark) or lands in an epoch the sink's
                # (partition, epoch) manifest already absorbs (resume)
                self.seen[side].intersection_update(map(int, kept["offset"]))
        return out

    def snapshot(self) -> bytes:
        return pickle.dumps({"stores": self.stores, "seen": self.seen,
                             "pending": self.pending,
                             "late_rows": self.late_rows, "rows_seen": self.rows_seen},
                            protocol=pickle.HIGHEST_PROTOCOL)

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.stores, self.seen, self.pending = d["stores"], d["seen"], d["pending"]
        self.late_rows, self.rows_seen = d["late_rows"], d["rows_seen"]


def make_operator(kind: str, **kw):
    """Factory used by the partition actor (kind: window|session|join)."""
    if kind == "window":
        return WindowedAggregateOp(**kw)
    if kind == "session":
        return SessionAggregateOp(**kw)
    if kind == "join":
        return SymmetricJoinOp(**kw)
    raise ValueError(kind)
