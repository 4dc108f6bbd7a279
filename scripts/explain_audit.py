"""Physical-plan audit: assert the plans we ship are the plans we want.

For each audited query: does the parquet scan push filters / prune columns,
are small dimensions broadcast, is there any unpartitioned window (single-
partition funnel), how many whole-stage-codegen spans. Prints one line per
query + a FAIL summary exit code, so plan regressions show up like test
failures.

Usage: python scripts/explain_audit.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: query -> (required plan fragments, forbidden plan fragments)
RULES: dict[str, tuple[list[str], list[str]]] = {
    "tpch_q1": (["PushedFilters: [IsNotNull(l_shipdate)"], []),
    "tpch_q3": (
        ["TakeOrderedAndProject", "PushedFilters: [IsNotNull(c_mktsegment)"],
        [],
    ),
    "tpch_q5": (["BroadcastHashJoin"], []),
    "top_customers": (["TakeOrderedAndProject", "BroadcastHashJoin"], []),
    "parts_revenue": (["TakeOrderedAndProject", "BroadcastHashJoin"], []),
    "token_freq": (["TakeOrderedAndProject"], []),
    "exact_dedup": (["HashAggregate"], []),
    "quality_filter": ([], ["Exchange"]),  # single scan, zero shuffles
    "repetition_filter": ([], ["Exchange"]),
    "doc_fingerprints": ([], ["Exchange", "Python"]),  # pure codegen scan
    "lang_id": ([], ["Exchange", "Python"]),
    "ann_topk": (["BroadcastNestedLoopJoin"], []),  # intentional baseline
    # narrow-first verify: the JVM similarity-upper-bound gate (the 8-char
    # prefix chain) must appear in the plan, i.e. pruning happens in codegen
    # before the Arrow/Python similarity kernel sees the pair stream
    "cite_verify_predicate": (
        ["ArrowEvalPython", "substring(a_norm_title#"],
        [],
    ),
    # code-clone arm: identity tiers are pure JVM (sha2/md5+regexp into a
    # hash aggregate — no Python worker anywhere in the plan)
    "code_exact_dup_groups": (["HashAggregate"], ["Python"]),
    "code_norm_dup_groups": (["HashAggregate"], ["Python"]),
    # tier M verify must stay codegen: exact Jaccard via array_intersect
    # over int64 gram hashes (the only Python is the one feature pass)
    "code_minhash_pairs": (["array_intersect"], []),
}

#: every audited plan must avoid the single-partition funnel an
#: unpartitioned window (or global sort without limit) plans as
GLOBAL_FORBIDDEN = ["Exchange SinglePartition"]


def main() -> int:
    import __spark_entry__ as entrymod
    from biblib_spark.session import get_spark

    spark = get_spark("explain_audit", cores=8, shuffle_partitions=8)
    qmap = entrymod.queries()
    failures = 0
    for name, (required, forbidden) in RULES.items():
        df = qmap[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems = []
        for frag in required:
            if frag not in plan:
                problems.append(f"missing {frag!r}")
        for frag in forbidden + GLOBAL_FORBIDDEN:
            if frag in plan:
                problems.append(f"forbidden {frag!r} present")
        formatted = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        ncodegen = formatted.count("[codegen id :")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: codegen_spans={ncodegen}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
