"""Structured Streaming surface.

The reference is strictly batch (no watermarks, no stateful operators —
SURVEY.md §2.9/§7.4), so the streaming extension here covers the natural
incremental-ingest path: ``readStream`` over a growing corpus directory ->
the SAME stateless parse/feature kernels (``mapInPandas`` reuses as-is on
streaming DataFrames) -> per-microbatch sinks. Incremental cross-batch
dedup state (signature store + union-find via ``applyInPandasWithState``)
remains future work; batch resumability lives in
``biblib_spark.plans.checkpoint``.
"""

from biblib_spark.streaming.ingest import (
    stream_exact_dedup,
    stream_features,
    stream_parse,
)

__all__ = ["stream_parse", "stream_features", "stream_exact_dedup"]
