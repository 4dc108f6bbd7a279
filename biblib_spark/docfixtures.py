"""Deterministic oracle fixtures for the document/embedding near-dup entries.

Same contract pattern as ``biblib_spark.fixtures`` (the citation fixture):
the parts of an operator that are NOT SQL-expressible — the MinHash band
keys, the 64-bit SimHash, the random-hyperplane LSH bucket assignment — are
materialized once, pure-Python, with the SAME kernels the Spark pipeline
uses, into small parquet files. The DuckDB oracle then re-implements the
operator itself (bucket self-join with the C7 star cap, hamming / n-gram
Jaccard / cosine verify, top-k ranking) independently in SQL over those
fixtures, while the Spark query runs the real operator end-to-end.

Inputs are the driver's own sf0.01 tables (read with pyarrow, no Spark):
- doc_simhash.parquet   (rid, sh)        — simhash64_batch(text, k=4)
- doc_bands.parquet     (rid, lsh_key)   — lsh_keys_batch(norm_text, k=5,
                                           128 perms, 32 bands, seed 97),
                                           exploded
- ann_planted.parquet   (vec_id, embedding) — sf0.01 embeddings cast to
  double + 5 seeded high-cosine planted neighbors per query id {0,1,2}
  (ANN recall is only meaningful against actually-close neighbors)
- ann_cand_plain.parquet   (query_id, neighbor_id) — LSH probe candidates
  over the PLAIN embeddings at the ann_topk_lsh contract config
  (n_planes=6, 1 table, 3 probe bits, seed 7)
- ann_cand_planted.parquet (query_id, neighbor_id) — same over the PLANTED
  table at the recall-harness config (12 planes x 4 tables, 3 probe bits)
- ann_cells_ivf.parquet   (vec_id, cell)   — IVF-Flat cell assignment from
  the shared train_ivf kernel (nlist=16, seed 7, 8 Lloyd iters, trained on
  the first 512 vectors by id)
- ann_probes_ivf.parquet  (query_id, cell) — the nprobe=4 nearest cells per
  contract query
- ann_cand_ivf_planted.parquet (query_id, neighbor_id) — IVF probe-join
  candidates over the PLANTED table at the recall-gate config (same
  train_ivf kernel; the ann_recall_ivf oracle reranks these in SQL)

Content is a pure function of the sf0.01 parquet + the kernel seeds; built
lazily with an atomic rename (concurrent builders produce identical bytes).
"""

from __future__ import annotations

import os
import shutil

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# v2: + IVF cell/probe fixtures (ann_cells_ivf, ann_probes_ivf)
# v3: + IVF candidates over the planted table (ann_cand_ivf_planted)
DOC_FIXTURE_DIR = os.path.join(REPO_ROOT, ".oracle_fixture_docs_v3")
DOC_SIMHASH = os.path.join(DOC_FIXTURE_DIR, "doc_simhash.parquet")
DOC_BANDS = os.path.join(DOC_FIXTURE_DIR, "doc_bands.parquet")
ANN_PLANTED = os.path.join(DOC_FIXTURE_DIR, "ann_planted.parquet")
ANN_CAND_PLAIN = os.path.join(DOC_FIXTURE_DIR, "ann_cand_plain.parquet")
ANN_CAND_PLANTED = os.path.join(DOC_FIXTURE_DIR, "ann_cand_planted.parquet")
ANN_CELLS_IVF = os.path.join(DOC_FIXTURE_DIR, "ann_cells_ivf.parquet")
ANN_PROBES_IVF = os.path.join(DOC_FIXTURE_DIR, "ann_probes_ivf.parquet")
ANN_CAND_IVF_PLANTED = os.path.join(
    DOC_FIXTURE_DIR, "ann_cand_ivf_planted.parquet"
)

SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness-gate scale

# contract configs — MUST stay in sync with the __spark_entry__ queries
SIMHASH_K = 4
MINHASH_K, MINHASH_PERMS, MINHASH_BANDS, MINHASH_SEED = 5, 128, 32, 97
ANN_DIM, ANN_SEED = 64, 7
PLAIN_PLANES, PLAIN_TABLES, PLAIN_PROBE = 6, 1, 3
REC_PLANES, REC_TABLES, REC_PROBE = 12, 4, 3
IVF_NLIST, IVF_NPROBE, IVF_SEED, IVF_ITERS, IVF_TRAIN = 16, 4, 7, 8, 512
PLANT_QUERIES = [0, 1, 2]
PLANT_PER_QUERY, PLANT_NOISE, PLANT_SEED = 5, 0.05, 99


def _norm_text(t: str) -> str:
    """Pure-Python twin of textops.norm_text_col (lowercase + ASCII alnum)."""
    import re

    return re.sub(r"[^a-z0-9]", "", t.lower())


def _lsh_candidates(ids, vecs, query_ids, n_planes, n_tables, probe_bits):
    """(query_id, neighbor_id) candidate pairs of the multi-table multi-probe
    LSH — the same _planes/_pack functions the Spark UDFs close over, so the
    bucket assignment is bit-identical to the operator's."""
    import numpy as np

    from biblib_spark.operators.ann import _pack, _planes

    planes = _planes(ANN_DIM, n_planes, n_tables, ANN_SEED)
    index: dict[int, list[int]] = {}
    for vid, v in zip(ids, vecs):
        arr = np.asarray(v, dtype=np.float64)
        for t in range(n_tables):
            index.setdefault(_pack(t, (planes[t] @ arr) > 0), []).append(vid)
    by_id = {vid: v for vid, v in zip(ids, vecs)}
    out = set()
    for q in query_ids:
        arr = np.asarray(by_id[q], dtype=np.float64)
        for t in range(n_tables):
            proj = planes[t] @ arr
            signs = proj > 0
            probes = [_pack(t, signs)]
            for i in np.argsort(np.abs(proj))[:probe_bits]:
                flipped = signs.copy()
                flipped[i] = ~flipped[i]
                probes.append(_pack(t, flipped))
            for p in probes:
                for vid in index.get(p, ()):
                    if vid != q:
                        out.add((q, vid))
    return sorted(out)


def _build(tmp: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biblib_spark.functions.minhash import _perm_params, lsh_keys_batch
    from biblib_spark.functions.simhash import simhash64_batch

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    sh = simhash64_batch(texts, SIMHASH_K)
    pq.write_table(
        pa.table({"rid": doc_ids, "sh": sh}).cast(
            pa.schema([("rid", pa.int64()), ("sh", pa.int64())])
        ),
        os.path.join(tmp, "doc_simhash.parquet"),
    )

    a, b = _perm_params(MINHASH_PERMS, MINHASH_SEED)
    keys = lsh_keys_batch(
        [_norm_text(t) for t in texts], MINHASH_K, a, b, MINHASH_BANDS
    )
    flat_rid = [r for r, ks in zip(doc_ids, keys) for _ in ks]
    flat_key = [k for ks in keys for k in ks]
    pq.write_table(
        pa.table({"rid": flat_rid, "lsh_key": flat_key}).cast(
            pa.schema([("rid", pa.int64()), ("lsh_key", pa.int64())])
        ),
        os.path.join(tmp, "doc_bands.parquet"),
    )

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    vec_ids = emb.column("vec_id").to_pylist()
    vecs = [
        np.asarray(v, dtype=np.float64) for v in emb.column("embedding").to_pylist()
    ]

    cand = _lsh_candidates(
        vec_ids, vecs, PLANT_QUERIES, PLAIN_PLANES, PLAIN_TABLES, PLAIN_PROBE
    )
    pq.write_table(
        pa.table(
            {"query_id": [p[0] for p in cand],
             "neighbor_id": [p[1] for p in cand]}
        ).cast(pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64())])),
        os.path.join(tmp, "ann_cand_plain.parquet"),
    )

    # IVF fixtures: same train_ivf kernel the Spark operator calls, trained
    # on the first IVF_TRAIN vectors by id (the operator's deterministic
    # sample = orderBy(id).limit(n)); the oracle replays probe-cells join +
    # exact rerank in SQL over these assignments
    from biblib_spark.operators.ann import train_ivf

    order = np.argsort(np.asarray(vec_ids, dtype=np.int64), kind="stable")
    sorted_vecs = [vecs[i] for i in order]
    centroids = train_ivf(
        np.asarray(sorted_vecs[:IVF_TRAIN], dtype=np.float64),
        IVF_NLIST, IVF_SEED, IVF_ITERS,
    )
    ct = centroids.T
    cells = [int(np.argmax(np.asarray(v) @ ct)) for v in vecs]
    pq.write_table(
        pa.table({"vec_id": vec_ids, "cell": cells}).cast(
            pa.schema([("vec_id", pa.int64()), ("cell", pa.int64())])
        ),
        os.path.join(tmp, "ann_cells_ivf.parquet"),
    )
    by_id_ivf = dict(zip(vec_ids, vecs))
    probe_q, probe_c = [], []
    for q in PLANT_QUERIES:
        dots = np.asarray(by_id_ivf[q]) @ ct
        for c in np.argsort(-dots, kind="stable")[:IVF_NPROBE]:
            probe_q.append(q)
            probe_c.append(int(c))
    pq.write_table(
        pa.table({"query_id": probe_q, "cell": probe_c}).cast(
            pa.schema([("query_id", pa.int64()), ("cell", pa.int64())])
        ),
        os.path.join(tmp, "ann_probes_ivf.parquet"),
    )

    # planted-neighbor table: seeded perturbed copies of each query vector
    # (ids 1_000_000 + q*100 + j), queries processed in sorted-id order so
    # the RNG stream is deterministic — no runtime collect() anywhere
    rng = np.random.default_rng(PLANT_SEED)
    by_id = dict(zip(vec_ids, vecs))
    p_ids = list(vec_ids)
    p_vecs = [v.tolist() for v in vecs]
    for q in PLANT_QUERIES:
        v = by_id[q]
        v = v / np.linalg.norm(v)
        for j in range(PLANT_PER_QUERY):
            p = v + PLANT_NOISE * rng.standard_normal(len(v))
            p_ids.append(1_000_000 + q * 100 + j)
            p_vecs.append([float(x) for x in p])
    pq.write_table(
        pa.table({"vec_id": p_ids, "embedding": p_vecs}).cast(
            pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
            )
        ),
        os.path.join(tmp, "ann_planted.parquet"),
    )

    cand2 = _lsh_candidates(
        p_ids,
        [np.asarray(v) for v in p_vecs],
        PLANT_QUERIES,
        REC_PLANES,
        REC_TABLES,
        REC_PROBE,
    )
    pq.write_table(
        pa.table(
            {"query_id": [p[0] for p in cand2],
             "neighbor_id": [p[1] for p in cand2]}
        ).cast(pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64())])),
        os.path.join(tmp, "ann_cand_planted.parquet"),
    )

    # IVF candidates over the PLANTED table (the ann_recall_ivf gate): same
    # train_ivf kernel + config as the Spark operator — train on the first
    # IVF_TRAIN vectors by id, assign one cell per vector, probe IVF_NPROBE
    # cells per query, candidate = shares a probed cell
    p_order = np.argsort(np.asarray(p_ids, dtype=np.int64), kind="stable")
    p_sorted = [p_vecs[i] for i in p_order]
    p_centroids = train_ivf(
        np.asarray(p_sorted[:IVF_TRAIN], dtype=np.float64),
        IVF_NLIST, IVF_SEED, IVF_ITERS,
    )
    pct = p_centroids.T
    p_cell = {
        i: int(np.argmax(np.asarray(v) @ pct)) for i, v in zip(p_ids, p_vecs)
    }
    by_id_p = dict(zip(p_ids, p_vecs))
    cq, cn = [], []
    for q in PLANT_QUERIES:
        probed = set(
            int(c)
            for c in np.argsort(
                -(np.asarray(by_id_p[q]) @ pct), kind="stable"
            )[:IVF_NPROBE]
        )
        for i in p_ids:
            if i != q and p_cell[i] in probed:
                cq.append(q)
                cn.append(i)
    pq.write_table(
        pa.table({"query_id": cq, "neighbor_id": cn}).cast(
            pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64())])
        ),
        os.path.join(tmp, "ann_cand_ivf_planted.parquet"),
    )


def ensure_doc_fixture() -> str:
    """Build the fixture parquet files if missing; returns DOC_FIXTURE_DIR."""
    if os.path.isdir(DOC_FIXTURE_DIR):
        return DOC_FIXTURE_DIR
    tmp = f"{DOC_FIXTURE_DIR}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    _build(tmp)
    try:
        os.rename(tmp, DOC_FIXTURE_DIR)
    except OSError:  # lost the race; the other builder's copy is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return DOC_FIXTURE_DIR
