"""Pure-Python kernels (no Spark imports).

Everything here is a deterministic function of its arguments so it can run
inside Arrow-batched pandas UDFs on executors. Semantics mirror the reference
implementation (cited per-function as ``file:line`` against /root/reference).
"""
