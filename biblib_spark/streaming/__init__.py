"""Structured Streaming surface — deliberately out of v1 scope.

The reference is strictly batch (no watermarks, no stateful operators —
SURVEY.md §2.9/§7.4); resumability comes from stage checkpoints
(biblib_spark.plans.checkpoint) instead. The natural streaming extension —
``readStream`` over the corpus table -> parse ``mapInPandas`` (stateless,
reusable as-is) -> incremental candidate generation against a compacted
signature store -> ``applyInPandasWithState`` union-find — is sketched here
for a later round; nothing imports this module yet.
"""
