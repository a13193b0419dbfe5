"""parallel_dataflow_ray — a Ray-Data-native streaming/CEP + batch data engine.

Re-creates the core abstractions of gabizon103/parallel-dataflow (an
iterative fixpoint dataflow framework, see /root/reference) as
watermark-driven streaming operators on ``ray.data.Dataset``:

- ``streaming/`` — the CEP engine proper: ``StreamOpSpec`` (the
  ``DataflowSpec`` analog, reference ``utils/src/dataflow_spec.rs:5-31``),
  a sequential oracle executor (``impls/src/sequential.rs:13-66`` analog),
  an epoch-batched parallel executor (``impls/src/parallel.rs:14-91``
  analog), tumbling/sliding/session windows, a stateful symmetric hash
  join, an exactly-once epoch-committed sink, and per-partition
  checkpoint/resume.
- ``stages/`` — batch operators expressed Ray-Data-first (map_batches /
  groupby / join / dedup / similarity), used by ``pipelines/``.
- ``functions/`` — vectorized kernels (audio codecs, text analysis,
  hashing) shared by both layers.

Everything here is derived from public knowledge only: the Ray Data and
pyarrow public APIs, and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
