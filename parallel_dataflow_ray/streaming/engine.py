"""StreamEngine — the epoch-batched parallel executor.

Graft of the reference's frontier-batched parallel worklist executor
(``impls/src/parallel.rs:14-91``): there, each round takes the whole
dirty frontier, fans it to a rayon pool against a state snapshot, then
merges results and builds the next frontier.  Here one **epoch** is one
round, executed as a BSP superstep in two phases:

  phase 1 — INGEST: stateless split tasks hash-partition the epoch's
    Arrow blocks on the operator key (one Ray task per block,
    ``num_returns=P`` object refs; rows move through the object store,
    never the driver).  P partition actors fold their shards into their
    key-window state stores and close windows the (precomputed,
    input-deterministic) watermark passed.  Closed windows of *salted*
    hot keys yield partial states instead of rows.

  phase 2 — FINALIZE: partials are routed to each key's owner partition
    (``stable_hash(key) % P``), merged via the operator spec's
    semilattice ``merge``, finished, appended to the epoch's emissions,
    committed to the exactly-once sink, and checkpointed.

Unlike the reference, whose merge phase is single-threaded and is
explicitly called out as the bottleneck (``blog/blog.md:47``), both
phases here are partition-parallel; the driver only moves epoch
metadata (refs, watermarks, partial-state envelopes for hot keys).

Skew: ``salted_keys = {key: n_salts}`` routes a hot key's rows across
``n_salts`` partitions (the blog's skew finding, ``blog/blog.md:84``,
is the motivation; semilattice merge is the correctness argument,
``blog/blog.md:91-103``).  Salting applies to the windowed-aggregate
operator; the symmetric join co-partitions strictly by key.

Scale notes: actors are long-lived (state amortized across epochs);
shards are shipped as object refs so Ray can spill under pressure; the
shuffle prunes to the columns the operator declares
(``spec.value_columns``) before anything moves.  On a real cluster the
same topology runs unchanged via ``ray job submit``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .checkpoint import CheckpointStore
from .oracle import canonical_sort
from .partitioning import partition_ids, split_by_partition
from .sink import ExactlyOnceSink
from .spec import StreamOpSpec
from .watermark import MIN_TS
from .operators import make_operator

END_WM = 2**62


@ray.remote
def _split_block(table: pa.Table, key_column: str, num_partitions: int,
                 salted_keys: dict | None):
    """Stateless shuffle-map task: one input block -> P hash shards."""
    shards = split_by_partition(table, key_column, num_partitions,
                                salted_keys=salted_keys)
    if num_partitions == 1:
        return shards[0]
    return tuple(shards)


@ray.remote(num_cpus=0.25)
class PartitionWorker:
    """One hash partition's stateful executor: operator + sink + ckpt."""

    def __init__(self, partition: int, op_kind: str, op_kwargs: dict,
                 sink_root: str | None, ckpt_root: str | None,
                 partial_keys: frozenset = frozenset()):
        import time
        self._time = time
        self.partition = partition
        if op_kind == "window" and partial_keys:
            op_kwargs = dict(op_kwargs, partial_keys=partial_keys)
        self.op_kind = op_kind
        self.op = make_operator(op_kind, **op_kwargs)
        self.sink = ExactlyOnceSink(sink_root, partition) if sink_root else None
        self.ckpt = CheckpointStore(ckpt_root, partition) if ckpt_root else None
        self.max_offset = -1
        self._pending: list[dict] = []
        self._ingest_s = 0.0

    def restore(self, epoch: int) -> int:
        d = self.ckpt.load(epoch)
        self.op.restore(d["op"])
        self.max_offset = d["max_offset"]
        return epoch

    def ingest_epoch(self, epoch: int, wm_prev: int, wm: int,
                     shards: list) -> list[tuple]:
        """Phase 1: fold shards, close windows; buffer finished rows and
        return partial states (salted keys) for owner-side merge."""
        t0 = self._time.perf_counter()
        # shards arrive as ObjectRefs inside a list (deliberately NOT
        # top-level args, so Ray does not copy them into the actor queue);
        # ray.get is zero-copy for Arrow tables in the local object store.
        if shards and isinstance(shards[0], ray.ObjectRef):
            shards = ray.get(list(shards))
        for shard in shards:
            if shard.num_rows:
                mo = pc.max(shard["offset"]).as_py()
                if mo is not None and mo > self.max_offset:
                    self.max_offset = mo
                self.op.apply(shard, wm_prev)
        if hasattr(self.op, "on_watermark_split"):
            rows, partials = self.op.on_watermark_split(wm)
        else:
            rows, partials = self.op.on_watermark(wm), []
        self._pending.extend(rows)
        self._ingest_s = self._time.perf_counter() - t0
        return partials

    def finalize_epoch(self, epoch: int, wm: int, partial_groups: dict,
                       *, checkpoint: bool, collect: bool,
                       commit: bool = True) -> dict:
        """Phase 2: merge partials owned by this partition, commit the
        epoch's emissions idempotently, checkpoint."""
        t0 = self._time.perf_counter()
        if partial_groups:
            self._pending.extend(self.op.merge_partials(partial_groups))
        emitted = canonical_sort(self._pending)
        self._pending = []
        table = pa.Table.from_pylist(emitted) if emitted else None
        elapsed = self._ingest_s + (self._time.perf_counter() - t0)
        if self.sink is not None and commit:
            self.sink.commit(epoch, table, watermark=wm,
                             max_offset=self.max_offset, elapsed_s=elapsed)
        if self.ckpt is not None and checkpoint and commit:
            self.ckpt.save(epoch, self.op.snapshot(), wm, self.max_offset)
        out = {"partition": self.partition, "epoch": epoch,
               "emitted": len(emitted), "late_rows": self.op.late_rows,
               "rows_seen": self.op.rows_seen, "elapsed_s": elapsed}
        if collect:
            out["emitted_rows"] = emitted
        return out


class StreamEngine:
    """Drives one operator over an epoch-framed stream.

    Parameters mirror a ``ray job submit`` job config: operator kind +
    kwargs, partition count P, lateness, salted hot keys, sink /
    checkpoint roots, checkpoint interval.
    """

    def __init__(self, op_kind: str, op_kwargs: dict, *, num_partitions: int = 8,
                 allowed_lateness_us: int = 0, sink_root: str | None = None,
                 ckpt_root: str | None = None, ckpt_interval: int = 4,
                 key_column: str | None = None, actor_num_cpus: float = 0.25,
                 salted_keys: dict[Any, int] | None = None,
                 shuffle_columns: list[str] | None = None):
        self.op_kind = op_kind
        self.op_kwargs = op_kwargs
        self.P = num_partitions
        self.lateness = allowed_lateness_us
        self.sink_root = sink_root
        self.ckpt_root = ckpt_root
        self.ckpt_interval = max(1, ckpt_interval)
        spec = op_kwargs.get("spec")
        if key_column is None:
            key_column = (spec.key_column if isinstance(spec, StreamOpSpec)
                          else op_kwargs.get("key_column", "clip_id"))
        self.key_column = key_column
        self.actor_num_cpus = actor_num_cpus
        self.salted_keys = dict(salted_keys) if salted_keys else None
        if self.op_kind != "window" and self.salted_keys:
            raise ValueError("salted_keys currently applies to the windowed "
                             "aggregate; joins co-partition strictly by key")
        # shuffle column pruning: key + time + lineage + what the spec reads
        if shuffle_columns is None and isinstance(spec, StreamOpSpec) and spec.value_columns:
            shuffle_columns = list(dict.fromkeys(
                [key_column, "event_ts", "offset", *spec.value_columns]))
        self.shuffle_columns = shuffle_columns

    # -- watermark schedule: pure function of (input, framing, lateness) --
    def _schedule(self, epochs: list[pa.Table], ts_column: str) -> list[int]:
        wms, mx = [], MIN_TS
        for t in epochs:
            if t.num_rows:
                m = pc.max(t[ts_column].cast(pa.int64())).as_py()
                mx = max(mx, m)
            wms.append(mx - self.lateness if mx != MIN_TS else MIN_TS)
        return wms

    def run(self, epochs: list[pa.Table], *, ts_column: str = "event_ts",
            collect: bool = False, stop_after_epoch: int | None = None,
            commit_partitions: set[int] | None = None,
            final_flush: bool = False) -> dict:
        """Run to stream end (or simulate a crash via ``stop_after_epoch``
        / a partial final-epoch commit via ``commit_partitions``).

        Returns {"emitted": rows-per-epoch if collect, "metrics": ...,
        "start_epoch": resumed-from, "watermarks": schedule}.  Resume is
        automatic when the checkpoint root holds a complete epoch.
        """
        wm_sched = self._schedule(epochs, ts_column)
        workers = [
            PartitionWorker.options(num_cpus=self.actor_num_cpus)
            .remote(p, self.op_kind, self.op_kwargs, self.sink_root,
                    self.ckpt_root,
                    frozenset(self.salted_keys) if self.salted_keys else frozenset())
            for p in range(self.P)
        ]
        start_epoch = 0
        if self.ckpt_root:
            re = CheckpointStore.resume_epoch(self.ckpt_root, self.P)
            if re is not None:
                ray.get([w.restore.remote(re) for w in workers])
                start_epoch = re + 1

        per_epoch_emitted: list[list[dict]] = []
        metrics: list[dict] = []
        try:
            for e in range(start_epoch, len(epochs)):
                if stop_after_epoch is not None and e > stop_after_epoch:
                    break
                is_last = (stop_after_epoch is not None and e == stop_after_epoch)
                self._superstep(
                    e, epochs[e],
                    wm_sched[e - 1] if e > 0 else MIN_TS, wm_sched[e],
                    workers, collect, per_epoch_emitted, metrics,
                    commit_partitions if is_last else None)
            if final_flush and stop_after_epoch is None:
                # end-of-stream: watermark -> +inf closes every open window
                # (the fixpoint-termination analog: the frontier empties)
                wm_last = wm_sched[-1] if wm_sched else MIN_TS
                self._superstep(len(epochs), None, wm_last, END_WM, workers,
                                collect, per_epoch_emitted, metrics, None)
        finally:
            for w in workers:
                ray.kill(w, no_restart=True)
        return {"emitted": per_epoch_emitted if collect else None,
                "metrics": metrics, "start_epoch": start_epoch,
                "watermarks": wm_sched}

    def _superstep(self, e: int, table: pa.Table | None, wm_prev: int, wm: int,
                   workers, collect, per_epoch_emitted, metrics,
                   commit_partitions) -> None:
        per_part: list[list] = [[] for _ in range(self.P)]
        if table is not None and table.num_rows:
            if self.shuffle_columns:
                cols = [c for c in self.shuffle_columns if c in table.column_names]
                if "__stream" in table.column_names:
                    cols.append("__stream")
                table = table.select(cols)
            split_refs = [
                _split_block.options(num_returns=1 if self.P == 1 else self.P)
                .remote(b, self.key_column, self.P, self.salted_keys)
                for b in self._blocks(table)
            ]
            for refs in split_refs:
                if self.P == 1:
                    per_part[0].append(refs)
                else:
                    for p, r in enumerate(refs):
                        per_part[p].append(r)
        # phase 1: ingest + close; collect partial states of salted keys
        partials_nested = ray.get([
            w.ingest_epoch.remote(e, wm_prev, wm, per_part[p])
            for p, w in enumerate(workers)])
        # route partials to the OWNER partition (unsalted hash)
        owner_groups: list[dict] = [{} for _ in range(self.P)]
        for plist in partials_nested:
            for key, w_, state in plist:
                owner = int(partition_ids([key], self.P)[0])
                owner_groups[owner].setdefault((key, w_), []).append(state)
        # phase 2: merge + commit + checkpoint
        futs = []
        for p, w in enumerate(workers):
            commit = True if commit_partitions is None else (p in commit_partitions)
            futs.append(w.finalize_epoch.remote(
                e, wm, owner_groups[p],
                checkpoint=(e % self.ckpt_interval == self.ckpt_interval - 1),
                collect=collect, commit=commit))
        results = ray.get(futs)
        metrics.extend({k: v for k, v in r.items() if k != "emitted_rows"}
                       for r in results)
        if collect:
            rows = [row for r in results for row in r.get("emitted_rows", [])]
            per_epoch_emitted.append(canonical_sort(rows))

    @staticmethod
    def _blocks(table: pa.Table, target_rows: int = 8192) -> list[pa.Table]:
        if table.num_rows <= target_rows:
            return [table]
        return [table.slice(i, target_rows)
                for i in range(0, table.num_rows, target_rows)]
