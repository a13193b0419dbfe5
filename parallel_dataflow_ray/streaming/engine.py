"""StreamEngine — the epoch-batched parallel executor.

Graft of the reference's frontier-batched parallel worklist executor
(``impls/src/parallel.rs:14-91``): there, each round takes the whole
dirty frontier, fans it to a rayon pool against a state snapshot, then
merges results and builds the next frontier.  Here one **epoch** is one
round:

    1. stateless split tasks hash-partition the epoch's Arrow blocks on
       the operator key (the map side of the shuffle; one Ray task per
       block, ``num_returns=P`` object refs — data moves through the
       object store, never the driver),
    2. P partition actors ingest their shards and fold them into their
       key-window state stores (the reduce side; state never migrates),
    3. the epoch watermark (precomputed, input-deterministic — see
       ``watermark.py``) closes windows; each actor emits + commits its
       rows to its exactly-once sink partition and periodically
       checkpoints.

Unlike the reference, whose merge phase is single-threaded and
explicitly called out as the bottleneck (``blog/blog.md:47``), the
merge here is itself partition-parallel: each actor merges only its own
key range, so there is no sequential assembly step — the driver only
moves epoch metadata (refs + watermarks), never rows.

Scale notes: with P partitions and B blocks/epoch the shuffle is B
split tasks × P refs; actors are long-lived (state amortized); object
refs let Ray spill shards under memory pressure.  On a real cluster the
same topology runs unchanged — split tasks on source nodes, actors
pinned by Ray's scheduler, refs shipped node-to-node.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .checkpoint import CheckpointStore
from .oracle import canonical_sort
from .partitioning import split_by_partition
from .sink import ExactlyOnceSink
from .spec import StreamOpSpec
from .watermark import MIN_TS
from .operators import make_operator


@ray.remote
def _split_block(table: pa.Table, key_column: str, num_partitions: int):
    """Stateless shuffle-map task: one input block -> P hash shards."""
    shards = split_by_partition(table, key_column, num_partitions)
    if num_partitions == 1:
        return shards[0]
    return tuple(shards)


@ray.remote(num_cpus=0.25)
class PartitionWorker:
    """One hash partition's stateful executor: operator + sink + ckpt."""

    def __init__(self, partition: int, op_kind: str, op_kwargs: dict,
                 sink_root: str | None, ckpt_root: str | None):
        import time
        self._time = time
        self.partition = partition
        self.op = make_operator(op_kind, **op_kwargs)
        self.sink = ExactlyOnceSink(sink_root, partition) if sink_root else None
        self.ckpt = CheckpointStore(ckpt_root, partition) if ckpt_root else None
        self.max_offset = -1

    def restore(self, epoch: int) -> int:
        d = self.ckpt.load(epoch)
        self.op.restore(d["op"])
        self.max_offset = d["max_offset"]
        return epoch

    def process_epoch(self, epoch: int, wm_prev: int, wm: int,
                      shards: list[pa.Table], *, checkpoint: bool,
                      collect: bool, commit: bool = True) -> dict:
        t0 = self._time.perf_counter()
        n_rows = 0
        # shards arrive as ObjectRefs inside a list (deliberately NOT
        # top-level args, so Ray does not copy them into the actor queue);
        # ray.get is zero-copy for Arrow tables in the local object store.
        shards = ray.get(list(shards)) if shards and isinstance(shards[0], ray.ObjectRef) else shards
        for shard in shards:
            if shard.num_rows:
                n_rows += shard.num_rows
                mo = pc.max(shard["offset"]).as_py()
                if mo is not None and mo > self.max_offset:
                    self.max_offset = mo
                self.op.apply(shard, wm_prev)
        emitted = canonical_sort(self.op.on_watermark(wm))
        table = pa.Table.from_pylist(emitted) if emitted else None
        elapsed = self._time.perf_counter() - t0
        if self.sink is not None and commit:
            self.sink.commit(epoch, table, watermark=wm,
                             max_offset=self.max_offset, elapsed_s=elapsed)
        if self.ckpt is not None and checkpoint and commit:
            self.ckpt.save(epoch, self.op.snapshot(), wm, self.max_offset)
        out = {"partition": self.partition, "epoch": epoch, "rows": n_rows,
               "emitted": len(emitted), "late_rows": self.op.late_rows,
               "elapsed_s": elapsed}
        if collect:
            out["emitted_rows"] = emitted
        return out


class StreamEngine:
    """Drives one operator over an epoch-framed stream.

    Parameters mirror a `ray job submit` job config: operator kind +
    kwargs, partition count P, lateness, sink/checkpoint roots,
    checkpoint interval.
    """

    def __init__(self, op_kind: str, op_kwargs: dict, *, num_partitions: int = 8,
                 allowed_lateness_us: int = 0, sink_root: str | None = None,
                 ckpt_root: str | None = None, ckpt_interval: int = 4,
                 key_column: str | None = None, actor_num_cpus: float = 0.25):
        self.op_kind = op_kind
        self.op_kwargs = op_kwargs
        self.P = num_partitions
        self.lateness = allowed_lateness_us
        self.sink_root = sink_root
        self.ckpt_root = ckpt_root
        self.ckpt_interval = max(1, ckpt_interval)
        if key_column is None:
            spec = op_kwargs.get("spec")
            key_column = (spec.key_column if isinstance(spec, StreamOpSpec)
                          else op_kwargs.get("key_column", "clip_id"))
        self.key_column = key_column
        self.actor_num_cpus = actor_num_cpus

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
            commit_partitions: set[int] | None = None) -> dict:
        """Run to stream end (or simulate a crash via ``stop_after_epoch`` /
        a partial commit via ``commit_partitions`` on the final epoch).

        Returns {"emitted": rows-per-epoch list if collect, "metrics": ...}.
        Resume is automatic: if the checkpoint root holds a complete
        epoch, workers restore and earlier epochs are skipped (their
        sink commits are already durable; re-emission is absorbed).
        """
        wm_sched = self._schedule(epochs, ts_column)
        workers = [
            PartitionWorker.options(num_cpus=self.actor_num_cpus)
            .remote(p, self.op_kind, self.op_kwargs,
                    self.sink_root, self.ckpt_root)
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
            self._loop(epochs, wm_sched, workers, start_epoch, ts_column,
                       collect, stop_after_epoch, commit_partitions,
                       per_epoch_emitted, metrics)
        finally:
            for w in workers:
                ray.kill(w, no_restart=True)
        return {"emitted": per_epoch_emitted if collect else None,
                "metrics": metrics, "start_epoch": start_epoch,
                "watermarks": wm_sched}

    def _loop(self, epochs, wm_sched, workers, start_epoch, ts_column,
              collect, stop_after_epoch, commit_partitions,
              per_epoch_emitted, metrics) -> None:
        for e in range(start_epoch, len(epochs)):
            if stop_after_epoch is not None and e > stop_after_epoch:
                break
            wm_prev = wm_sched[e - 1] if e > 0 else MIN_TS
            wm = wm_sched[e]
            table = epochs[e]
            # shuffle-map: split this epoch's blocks into P shards each
            blocks = self._blocks(table)
            split_refs = [
                _split_block.options(num_returns=1 if self.P == 1 else self.P)
                .remote(b, self.key_column, self.P)
                for b in blocks
            ]
            per_part: list[list] = [[] for _ in range(self.P)]
            for refs in split_refs:
                if self.P == 1:
                    per_part[0].append(refs)
                else:
                    for p, r in enumerate(refs):
                        per_part[p].append(r)
            is_last_scheduled = (stop_after_epoch is not None and e == stop_after_epoch)
            futs = []
            for p, w in enumerate(workers):
                commit = True
                if is_last_scheduled and commit_partitions is not None:
                    commit = p in commit_partitions
                futs.append(w.process_epoch.remote(
                    e, wm_prev, wm, per_part[p],
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
