"""The streaming/CEP engine: spec, windows, watermarks, executors, sink.

Layer map (reference file:line -> here):

- ``DataflowSpec`` trait (``utils/src/dataflow_spec.rs:5-31``) -> ``spec.StreamOpSpec``
- sequential worklist executor (``impls/src/sequential.rs:13-66``) -> ``oracle.OracleExecutor``
- frontier-batched parallel executor (``impls/src/parallel.rs:14-91``) -> ``engine.StreamEngine``
- worklist/frontier -> ``watermark.WatermarkClock`` (epoch watermark schedule)
- the four passes (``passes/src/*.rs``) -> ``kernels`` K1-K4
- debug stdout sink (``impls/src/passes.rs:112-117``) -> ``sink.ExactlyOnceSink``
"""

from .spec import StreamOpSpec, TOP
from .windows import TumblingWindows, SlidingWindows, SessionWindows
from .watermark import WatermarkClock
from .oracle import OracleExecutor
from .engine import StreamEngine
from .sink import ExactlyOnceSink

__all__ = [
    "StreamOpSpec", "TOP",
    "TumblingWindows", "SlidingWindows", "SessionWindows",
    "WatermarkClock", "OracleExecutor", "StreamEngine", "ExactlyOnceSink",
]
