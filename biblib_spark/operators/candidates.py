"""Candidate-pair generation tiers (C1-C5, C7 of SURVEY.md §2.8).

The reference compares all pairs within a year block — O(n_y²)
(src/dedupe.rs:594-655). At 10⁹+ rows the pairwise join is replaced by
candidate tiers; the reference predicate then verifies candidates only, so
precision is reference-identical and recall is governed by tier coverage:

- T0 exact identity: equi-joins on the (parse-normalized) DOI, the PMID and
  the accession number — the reference's identity fields (src/lib.rs:299-304)
- T1 exact normalized title: equi-join on norm_title
- T2 MinHash-LSH band keys over norm_title shingles
- T3 SimHash quarter keys for short titles

All tiers block on year_key (M1: comparisons never cross blocks). Skew (C7):
a bucket larger than ``max_bucket`` (mega-journal year blocks, boilerplate
titles) would generate O(n²) pairs; the ``star`` policy links every member to
the bucket's min-rid seed instead (n-1 pairs) — connected components then
recovers the full group through the seed. AQE skew-join splitting handles
physical skew on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def pairs_from_rid_lists(grouped: DataFrame, max_bucket: int) -> DataFrame:
    """(rids sorted-array) rows -> candidate pairs (a, b) with a < b.

    Pair expansion is a JVM-side explode (no second shuffle, no window
    sort). Buckets within ``max_bucket`` produce all pairs; oversize buckets
    produce star pairs against the min-rid element (C7).

    ONE pass over the bucket exchange: the small-bucket all-pairs arrays and
    the oversize-bucket star arrays are built as branches of a single
    conditional projection and exploded once. The previous two-branch form
    (small filter + big filter unioned) planned a ReusedExchange that read
    the whole grouped shuffle TWICE — 8.6 GB read for the flagship's 4.3 GB
    bucket exchange (r06 baseline event log, stage 111). Pair-set equality
    with the two-branch form: rids are sorted and unique within a bucket, so
    slicing past index i equals filtering on (x > rids[i]); pinned by the
    strategy-identity tests in tests/test_dedupe_spark.py.
    """
    grouped = grouped.filter(F.size("rids") > 1).select("rids")
    rids = F.col("rids")
    n = F.size(rids)
    all_pairs = F.flatten(
        F.transform(
            rids,
            lambda x, i: F.transform(
                F.slice(rids, i + F.lit(2), n - i - F.lit(1)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    star_pairs = F.transform(
        F.slice(rids, F.lit(2), n - F.lit(1)),
        lambda y: F.struct(rids[0].alias("a"), y.alias("b")),
    )
    structs = F.when(n <= max_bucket, all_pairs).otherwise(star_pairs)
    return grouped.select(F.explode(structs).alias("p")).select("p.a", "p.b")


def self_join_pairs(
    keyed: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """(keys..., rid) -> candidate pairs (a, b) with a < b.

    ONE shuffle: groupBy bucket -> sorted rid array; singleton buckets (the
    overwhelming majority at scale) die in the aggregation; see
    ``pairs_from_rid_lists`` for the expansion / star-cap policy.
    """
    grouped = keyed.groupBy(*[F.col(k) for k in keys]).agg(
        F.sort_array(F.collect_list("rid")).alias("rids")
    )
    return pairs_from_rid_lists(grouped, max_bucket)


#: C1 exact-identity tier: (tier salt, feature column). Two records sharing
#: any identity value become candidates even when their titles diverge enough
#: to escape every LSH band (the verify predicate still decides dup-ness).
IDENTITY_TIERS = (("doi", "doi"), ("pmid", "pmid"), ("accn", "accession_number"))


def identity_keyed(
    feat: DataFrame, tiers: tuple = IDENTITY_TIERS
) -> DataFrame:
    """(year_key, bkey, rid) rows for the exact-identity tier (C1)."""
    parts = [
        feat.filter(F.col(col).isNotNull() & (F.col(col) != "")).select(
            "year_key",
            F.xxhash64(F.lit(salt), F.col(col)).alias("bkey"),
            "rid",
        )
        for salt, col in tiers
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def affix_keyed(feat: DataFrame, which: str, length: int) -> DataFrame:
    """C4 containment-admission keys: the first (``prefix``) or last
    (``suffix``) ``length`` chars of norm_title. Tail-truncated/decorated
    titles share a prefix slice even when band hashes diverge; HEAD-truncated
    ones ('[Abstract] ...', dropped leading words) share the suffix slice.
    Boilerplate affixes are tamed by the same star cap as every bucket."""
    slc = (
        F.substring("norm_title", 1, length)
        if which == "prefix"
        else F.substring("norm_title", -length, length)
    )
    return feat.filter(F.length("norm_title") >= length).select(
        "year_key",
        F.xxhash64(F.lit(which), slc).alias("bkey"),
        "rid",
    )


def self_join_pairs_joined(
    keyed: DataFrame, keys: list[str], max_bucket: int
) -> DataFrame:
    """Zero-object-aggregation twin of ``self_join_pairs``: identical pair
    set, no ``collect_list`` anywhere.

    Why: ``collect_list`` plans as ObjectHashAggregate, whose fallback
    (default 128 in-memory entries) degenerates to a sort-based aggregation
    of JAVA OBJECT rows — the flagship's event logs show that stage spilling
    42-48 GB of execution memory and burning 1.7x more CPU-seconds at 32
    cores than at 8 for identical work (bench_runs/r04/
    stage_metrics_8c_32c.json, stage 46/111), the single largest
    memory-bandwidth term in the job. Raising the fallback threshold OOMs
    instead (ab_spill_aggfb1m.json, GCLocker retry storm).

    Here every operator stays inside Tungsten whole-stage codegen:

    1. bucket sizes + min rid via an ALGEBRAIC aggregation (count/min over
       two longs — partial map-side combine, radix-sortable UnsafeRows,
       no object buffers);
    2. small buckets (<= max_bucket): pair expansion as a self-equi-join on
       the bucket key with ``a < b`` as the join predicate — the shuffled
       child is planned once and reused (ReusedExchange) for both sides;
    3. oversize buckets: the same streamed star join as the salted path
       (C7 — n-1 edges against the bucket's min rid, no task ever holds a
       bucket).
    """
    kcols = [F.col(k) for k in keys]
    sizes = (
        keyed.groupBy(*kcols)
        .agg(F.count(F.lit(1)).alias("n"), F.min("rid").alias("min_rid"))
        .filter(F.col("n") > 1)
    )

    small_keys = sizes.filter(F.col("n") <= max_bucket).select(*keys)
    small = keyed.join(small_keys, keys)
    left = small.select(*keys, F.col("rid").alias("a"))
    right = small.select(*keys, F.col("rid").alias("b"))
    small_pairs = left.join(
        right, [*(left[k] == right[k] for k in keys), F.col("a") < F.col("b")]
    ).select("a", "b")

    big_keys = sizes.filter(F.col("n") > max_bucket).select(*keys, "min_rid")
    big_pairs = (
        keyed.join(big_keys, keys)
        .filter(F.col("rid") != F.col("min_rid"))
        .select(F.col("min_rid").alias("a"), F.col("rid").alias("b"))
    )
    return small_pairs.unionByName(big_pairs)


def self_join_pairs_salted(
    keyed: DataFrame, keys: list[str], max_bucket: int, salt: int = 16
) -> DataFrame:
    """Skew-hardened twin of ``self_join_pairs`` (C7, north_rule's salted
    repartitioning): identical output pairs, but NO task ever materializes a
    whole bucket.

    ``self_join_pairs`` collect_lists each bucket before capping — bounded
    pairs, but a 10^8-member boilerplate bucket is one 800 MB aggregation
    buffer on one task. Here:

    1. bucket sizes + min rid via a SALTED two-level aggregation — partial
       (bucket, rid%salt) aggregates combine map-side, so the hot bucket's
       size is computed by ``salt`` tasks, then ``salt`` tiny rows merge;
    2. small buckets (<= max_bucket) take the exact all-pairs path (their
       collect_list is bounded by max_bucket by construction);
    3. oversize buckets emit star pairs by STREAMING the keyed rows through
       a join against their (bucket -> min_rid) table — row-at-a-time, no
       list; AQE skew-join splits the hot probe partitions.
    """
    kcols = [F.col(k) for k in keys]
    salted = keyed.groupBy(
        *kcols, F.pmod(F.xxhash64("rid"), F.lit(salt)).alias("__salt")
    ).agg(F.count(F.lit(1)).alias("c"), F.min("rid").alias("m"))
    sizes = (
        salted.groupBy(*kcols)
        .agg(F.sum("c").alias("n"), F.min("m").alias("min_rid"))
        .filter(F.col("n") > 1)
    )

    small_keys = sizes.filter(F.col("n") <= max_bucket).select(*keys)
    small = keyed.join(small_keys, keys)
    small_pairs = (
        small.groupBy(*kcols)
        .agg(F.sort_array(F.collect_list("rid")).alias("rids"))
        .select("rids")
        .select(F.explode("rids").alias("a"), F.col("rids"))
        .select(
            "a",
            F.explode(F.filter("rids", lambda x: x > F.col("a"))).alias("b"),
        )
    )

    big_keys = sizes.filter(F.col("n") > max_bucket).select(*keys, "min_rid")
    big_pairs = (
        keyed.join(big_keys, keys)
        .filter(F.col("rid") != F.col("min_rid"))
        .select(F.col("min_rid").alias("a"), F.col("rid").alias("b"))
    )
    return small_pairs.unionByName(big_pairs)


def _group_keyed(tg: DataFrame, cfg) -> DataFrame:
    """(year_key, bkey, rid=tgid) rows for the similarity tiers, one row set
    per DISTINCT normalized title instead of per record."""
    tiers = [
        tg.select(
            "year_key", F.explode("lsh_keys").alias("k"), F.col("tgid").alias("rid")
        ).select(
            "year_key", F.xxhash64(F.lit("lsh"), F.col("k")).alias("bkey"), "rid"
        )
    ]
    if cfg.simhash_enabled:
        tiers.append(
            tg.select(
                "year_key",
                F.explode("simhash_keys").alias("k"),
                F.col("tgid").alias("rid"),
            ).select(
                "year_key", F.xxhash64(F.lit("sim"), F.col("k")).alias("bkey"), "rid"
            )
        )
    grouped_feat = tg.select(
        "year_key", "norm_title", F.col("tgid").alias("rid")
    )
    if cfg.prefix_tier:
        tiers.append(affix_keyed(grouped_feat, "prefix", cfg.prefix_len))
    if cfg.suffix_tier:
        tiers.append(affix_keyed(grouped_feat, "suffix", cfg.prefix_len))
    keyed = tiers[0]
    for t in tiers[1:]:
        keyed = keyed.unionByName(t)
    return keyed


def flat_candidate_keys(feat: DataFrame, cfg) -> DataFrame:
    """ONE-SCAN tier-key generation: every tier's keys (identity, LSH band,
    SimHash quarter, affix) are built as conditional arrays in a single
    projection, concatenated, and exploded once — (year_key, bkey, rid) rows
    identical (as a multiset) to unioning one branch per tier, established by
    tests/test_dedupe_spark.py's keyed-identity test.

    Why not a union of per-tier branches: each branch is a SEPARATE scan of
    the (spilled) feature table — with fine input splits that is thousands of
    extra map tasks whose scheduling/dispatch cost is core-count-independent
    (pure fixed cost under the scaling gate), plus 6x decode of the shared
    rid/year_key columns. One scan + one explode keeps the whole key build
    inside one whole-stage-codegen pass.
    """
    empty = F.array().cast("array<bigint>")

    def opt(cond, key):
        return F.coalesce(F.when(cond, F.array(key)), empty)

    def ident(salt: str, col: str):
        c = F.col(col)
        return opt(c.isNotNull() & (c != ""), F.xxhash64(F.lit(salt), c))

    id_tiers = IDENTITY_TIERS if cfg.pmid_accession_tiers else IDENTITY_TIERS[:1]
    parts = [ident(salt, col) for salt, col in id_tiers]
    if cfg.exact_title_tier:
        parts.append(
            opt(
                F.col("norm_title") != "",
                F.xxhash64(F.lit("title"), F.col("norm_title")),
            )
        )
    # coalesce: F.concat is NULL-absorbing — one NULL key array (a record
    # that skipped feature extraction) must not erase the record's other tiers
    parts.append(
        F.coalesce(
            F.transform("lsh_keys", lambda k: F.xxhash64(F.lit("lsh"), k)), empty
        )
    )
    if cfg.simhash_enabled:
        parts.append(
            F.coalesce(
                F.transform("simhash_keys", lambda k: F.xxhash64(F.lit("sim"), k)),
                empty,
            )
        )
    long_enough = F.length("norm_title") >= cfg.prefix_len
    if cfg.prefix_tier:
        parts.append(
            opt(
                long_enough,
                F.xxhash64(
                    F.lit("prefix"), F.substring("norm_title", 1, cfg.prefix_len)
                ),
            )
        )
    if cfg.suffix_tier:
        parts.append(
            opt(
                long_enough,
                F.xxhash64(
                    F.lit("suffix"),
                    F.substring("norm_title", -cfg.prefix_len, cfg.prefix_len),
                ),
            )
        )
    return feat.select(
        "year_key", F.explode(F.concat(*parts)).alias("bkey"), "rid"
    )


def flat_candidate_pairs(feat: DataFrame, cfg) -> DataFrame:
    """Single-shuffle tier union: every tier key is hashed into ONE int64
    ``bkey`` column (tier-salted xxhash64) per RECORD in a single scan
    (``flat_candidate_keys``), and all tiers share one self-join — one
    shuffle for bucket sizing, one for the pair dedup, instead of one per
    tier. Hash collisions across tiers only add candidates; verify keeps
    precision exact.

    This is the DEFAULT path: the candidate stage's cost at a given core
    count is dominated by shuffle-stage latency (scheduler + AQE + barrier
    per stage), not by keyed-row volume — measured at 3M records, the
    grouped path's 6 extra stages scaled 0.28 from 8->32 cores while this
    2-shuffle DAG's one big self-join scaled 3.8/4.
    """
    keyed = flat_candidate_keys(feat, cfg)
    # no pre-distinct: (bucket, rid) rows are already unique within each tier
    # and the tier salt keeps them distinct across tiers
    if cfg.salted_pairs:
        gen = self_join_pairs_salted
    elif getattr(cfg, "pair_strategy", "agg") == "join":
        gen = self_join_pairs_joined
    else:
        gen = self_join_pairs
    if getattr(cfg, "fused_bucket_key", True):
        # year_key folded INTO the 64-bit bucket key: the keyed-row exchange
        # is the pipeline's widest shuffle (~20 rows/record), and one long
        # key instead of (int, long) narrows the row ~25% and makes the
        # bucket groupBy a single-long radix sort/hash. A 2^-64 key
        # collision can merge two buckets (including across year blocks) —
        # candidates only; the verify predicate stays exact, the same
        # negligible-collision budget the tier-salted xxhash64 keys above
        # already spend.
        keyed = keyed.select(
            F.xxhash64("year_key", "bkey").alias("bkey"), "rid"
        )
        pairs = gen(keyed, ["bkey"], cfg.max_bucket)
    else:
        pairs = gen(keyed, ["year_key", "bkey"], cfg.max_bucket)
    # C5: one verify per unordered pair (same pair can surface in many tiers)
    return pairs.distinct()


def candidate_pairs(feat: DataFrame, cfg) -> DataFrame:
    """All tiers unioned and deduped (C5). ``feat`` must carry
    rid, year_key, doi, norm_title, lsh_keys, simhash_keys.

    Dispatches on ``cfg.title_grouping``: False (default) -> the
    single-shuffle ``flat_candidate_pairs``; True -> the title-group path
    below, worth its extra stages only when the exact-normalized-duplicate
    factor is high (its win scales with records-per-distinct-title, its cost
    is ~6 extra shuffle stages of core-count-independent latency).

    Title-group path: records are first grouped by
    (year_key, xxhash64(norm_title)). Every record of a group shares
    IDENTICAL lsh/simhash/affix keys (they are pure functions of
    norm_title), so the similarity tiers run over one representative per
    group instead of per record: when most duplicates are
    exact-normalized-content duplicates this collapses both the keyed-union
    shuffle and the pair-dedup volume by the duplication factor. Tier
    structure:

    - within-group: all pairs of a title group (star-capped at max_bucket) —
      subsumes the exact-title tier;
    - cross-group: LSH band / SimHash quarter / affix keys over group
      representatives -> distinct group pairs -> expanded to record pairs
      (each side's members capped at max_bucket; beyond-cap members stay
      reachable through the within-group star seed);
    - identity (C1): record-keyed equi-join tiers as before (doi/pmid/accn
      are NOT functions of the title).

    A 64-bit title-hash collision can only MERGE two groups, which adds
    candidates (verify keeps precision exact) and can hide the smaller
    group's similarity keys (F.first) — at 10^12 rows the expected number of
    colliding title pairs is ~30 globally, each still covered by the
    within-group and identity tiers. Every tier key is hashed into ONE int64
    ``bkey`` column (tier-salted xxhash64); hash collisions across tiers
    only add candidates.
    """
    if not getattr(cfg, "title_grouping", False):
        return flat_candidate_pairs(feat, cfg)
    id_tiers = (
        IDENTITY_TIERS if cfg.pmid_accession_tiers else IDENTITY_TIERS[:1]
    )
    id_pairs = (
        self_join_pairs_salted if cfg.salted_pairs else self_join_pairs
    )(identity_keyed(feat, id_tiers), ["year_key", "bkey"], cfg.max_bucket)

    tkey = F.xxhash64(F.lit("tg"), F.col("norm_title"))
    if cfg.salted_pairs:
        # skew-hardened twin: no task ever materializes a whole title group.
        # Group sizes via salted two-level agg; small groups collect bounded
        # rid lists; oversize groups contribute (a) star pairs streamed
        # through a row-at-a-time join and (b) their seed row to the
        # similarity tiers (members beyond the seed reach clusters through
        # the star edges).
        keyed_t = feat.select("year_key", tkey.alias("bkey"), "rid")
        wg_pairs = self_join_pairs_salted(
            keyed_t, ["year_key", "bkey"], cfg.max_bucket
        )
        salted = keyed_t.groupBy(
            "year_key", "bkey", F.pmod(F.xxhash64("rid"), F.lit(16)).alias("__s")
        ).agg(F.count(F.lit(1)).alias("c"), F.min("rid").alias("m"))
        sizes = salted.groupBy("year_key", "bkey").agg(
            F.sum("c").alias("n"), F.min("m").alias("min_rid")
        )
        small_members = (
            feat.select("year_key", tkey.alias("bkey"), "rid")
            .join(
                sizes.filter(F.col("n") <= cfg.max_bucket).select(
                    "year_key", "bkey"
                ),
                ["year_key", "bkey"],
            )
            .groupBy("year_key", "bkey")
            .agg(F.sort_array(F.collect_list("rid")).alias("rids"))
        )
        big_members = sizes.filter(F.col("n") > cfg.max_bucket).select(
            "year_key", "bkey", F.array("min_rid").alias("rids")
        )
        members = small_members.unionByName(big_members).withColumn(
            "tgid", F.col("rids")[0]
        )
        rep = feat.select(
            "year_key",
            tkey.alias("bkey"),
            F.col("rid").alias("tgid"),
            "norm_title",
            "lsh_keys",
            "simhash_keys",
        ).join(members.select("year_key", "bkey", "tgid"), ["year_key", "bkey", "tgid"])
        tg = rep.join(members.select("tgid", "rids"), "tgid")
        gen = self_join_pairs_salted
    else:
        tg = (
            feat.groupBy("year_key", tkey.alias("tkey"))
            .agg(
                F.sort_array(F.collect_list("rid")).alias("rids"),
                F.first("norm_title").alias("norm_title"),
                F.first("lsh_keys").alias("lsh_keys"),
                F.first("simhash_keys").alias("simhash_keys"),
            )
            .withColumn("tgid", F.col("rids")[0])
        )
        wg_pairs = pairs_from_rid_lists(tg, cfg.max_bucket)
        gen = self_join_pairs

    # cross-group candidate pairs over group representatives
    tg_pairs = gen(
        _group_keyed(tg.filter(F.col("norm_title") != ""), cfg),
        ["year_key", "bkey"],
        cfg.max_bucket,
    ).distinct()
    mem = tg.select("tgid", F.slice("rids", 1, cfg.max_bucket).alias("mrids"))
    cross_pairs = (
        tg_pairs.join(
            mem.select(F.col("tgid").alias("a"), F.col("mrids").alias("arids")), "a"
        )
        .join(mem.select(F.col("tgid").alias("b"), F.col("mrids").alias("brids")), "b")
        .select(F.explode("arids").alias("x"), "brids")
        .select("x", F.explode("brids").alias("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
    )

    pairs = wg_pairs.unionByName(id_pairs).unionByName(cross_pairs)
    # C5: one verify per unordered pair (same pair can surface in many tiers)
    return pairs.distinct()
