"""Dump .explain("formatted") for declared queries to plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
bench-timed set). The flagship pipeline plan is captured via the
``parse_dedupe_cluster`` pseudo-query (dedupe_corpus on a small corpus —
same plan shape as the 6M bench job; AQE initial plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r06")

DEFAULT = [
    "near_dup_minhash",
    "ann_topk",
    "exact_dedup",
    "doc_stats",
    "tpch_q1",
    "top_customers",
    "code_dup_clusters",
    "parse_dedupe_cluster",
]


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT, exist_ok=True)

    from biblib_spark.session import get_spark

    spark = get_spark("capture_plans", cores=8)
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    for name in names:
        if name == "parse_dedupe_cluster":
            from biblib_spark.corpus import make_corpus
            from biblib_spark.operators.dedupe import DedupConfig, dedupe_corpus
            from biblib_spark.plans.spill import cleanup_all

            corpus = make_corpus(spark, 2000, seed=42)
            df = dedupe_corpus(corpus, DedupConfig())
            txt = _explain_str(df)
            cleanup_all()
        else:
            df = qmap[name](spark, SF_DIR)
            txt = _explain_str(df)
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
