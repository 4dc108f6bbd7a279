"""Dev harness: compare the new doc-fixture DuckDB oracles against the live
Spark operators (same comparison the driver does: sorted rows, all columns).
Run: python scripts/dev_doc_oracles.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from biblib_spark.docfixtures import (
    ANN_CAND_PLAIN,
    ANN_CAND_PLANTED,
    ANN_PLANTED,
    DOC_BANDS,
    DOC_SIMHASH,
    ensure_doc_fixture,
)

SF = "/root/testdata/sf0.01"


def compare(name, sdf, sql, con):
    spark_rows = sorted(tuple(r) for r in sdf.collect())
    oracle_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    if spark_rows == oracle_rows:
        print(f"ok    {name}: {len(spark_rows)} rows match")
        return True
    print(f"FAIL  {name}: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    so, oo = set(spark_rows), set(oracle_rows)
    for r in list(so - oo)[:5]:
        print("  spark-only ", r)
    for r in list(oo - so)[:5]:
        print("  oracle-only", r)
    return False


def main():
    ensure_doc_fixture()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )

    from pyspark.sql import functions as F

    from biblib_spark.operators.ann import cosine_topk, cosine_topk_lsh
    from biblib_spark.operators.textops import (
        near_dup_pairs_minhash,
        near_dup_pairs_simhash,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    ok = True

    sh_sql = f"""
WITH s AS (SELECT rid, sh FROM read_parquet('{DOC_SIMHASH}')),
k AS (SELECT rid, (q::BIGINT << 16) | ((sh >> (16*q)) & 65535) AS bkey
      FROM s, range(4) t(q)),
g AS (SELECT bkey, count(*) AS n, min(rid) AS mn FROM k GROUP BY bkey),
small AS (SELECT k1.rid AS a, k2.rid AS b FROM k k1
  JOIN k k2 ON k1.bkey = k2.bkey AND k1.rid < k2.rid
  JOIN g ON g.bkey = k1.bkey AND g.n <= 64),
big AS (SELECT g.mn AS a, k.rid AS b FROM k
  JOIN g ON g.bkey = k.bkey AND g.n > 64 AND k.rid <> g.mn),
cand AS (SELECT DISTINCT a, b FROM (SELECT * FROM small UNION ALL SELECT * FROM big))
SELECT c.a, c.b, bit_count(xor(s1.sh, s2.sh))::INT AS hamming
FROM cand c JOIN s s1 ON c.a = s1.rid JOIN s s2 ON c.b = s2.rid
WHERE bit_count(xor(s1.sh, s2.sh)) <= 20
"""
    ok &= compare(
        "near_dup_simhash",
        near_dup_pairs_simhash(docs, max_hamming=20),
        sh_sql,
        con,
    )

    mh_sql = f"""
WITH kk AS (SELECT rid, lsh_key FROM read_parquet('{DOC_BANDS}')),
g AS (SELECT lsh_key, count(*) AS n, min(rid) AS mn FROM kk GROUP BY lsh_key),
small AS (SELECT k1.rid AS a, k2.rid AS b FROM kk k1
  JOIN kk k2 ON k1.lsh_key = k2.lsh_key AND k1.rid < k2.rid
  JOIN g ON g.lsh_key = k1.lsh_key AND g.n <= 64),
big AS (SELECT g.mn AS a, kk.rid AS b FROM kk
  JOIN g ON g.lsh_key = kk.lsh_key AND g.n > 64 AND kk.rid <> g.mn),
cand AS (SELECT DISTINCT a, b FROM (SELECT * FROM small UNION ALL SELECT * FROM big)),
t AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt
      FROM documents),
gs AS (SELECT doc_id, CASE WHEN length(nt) >= 3 THEN
    list_distinct([substring(nt, i, 3) FOR i IN range(1, length(nt) - 1)])
  WHEN length(nt) > 0 THEN [nt] ELSE [] END AS grams FROM t),
j AS (SELECT c.a, c.b, len(list_intersect(g1.grams, g2.grams))::DOUBLE
    / len(list_distinct(g1.grams || g2.grams)) AS jaccard
  FROM cand c JOIN gs g1 ON c.a = g1.doc_id JOIN gs g2 ON c.b = g2.doc_id)
SELECT a, b, round(jaccard, 4) AS jaccard FROM j WHERE jaccard >= 0.5
"""
    ok &= compare(
        "near_dup_minhash",
        near_dup_pairs_minhash(docs, threshold=0.5),
        mh_sql,
        con,
    )

    lsh_sql = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
c AS (SELECT query_id, neighbor_id FROM read_parquet('{ANN_CAND_PLAIN}')),
scored AS (SELECT c.query_id, c.neighbor_id,
  list_dot_product(b.vec, q.vec) / (sqrt(list_dot_product(b.vec, b.vec))
   * sqrt(list_dot_product(q.vec, q.vec))) AS s
  FROM c JOIN base b ON c.neighbor_id = b.vec_id
  JOIN base q ON c.query_id = q.vec_id),
ranked AS (SELECT query_id, neighbor_id, row_number() OVER
  (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rank,
  round(s, 4) AS sim FROM scored)
SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
"""
    ok &= compare(
        "ann_topk_lsh",
        cosine_topk_lsh(emb, query_ids=[0, 1, 2], k=5, n_planes=6).withColumn(
            "rank", F.col("rank").cast("long")
        ),
        lsh_sql,
        con,
    )

    planted = spark.read.parquet(ANN_PLANTED)
    exact = cosine_topk(planted, [0, 1, 2], k=5)
    lsh = cosine_topk_lsh(
        planted, [0, 1, 2], k=5, n_planes=12, n_tables=4, probe_bits=3, seed=7
    )
    hits = exact.join(
        lsh.select("query_id", "neighbor_id").withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    recall_df = (
        hits.groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / 5.0, 2))
    )
    rec_sql = f"""
WITH base AS (SELECT vec_id, embedding AS vec FROM read_parquet('{ANN_PLANTED}')),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM base WHERE vec_id IN (0, 1, 2)),
scored AS (SELECT q.query_id, b.vec_id AS neighbor_id,
  list_dot_product(b.vec, q.qvec) / (sqrt(list_dot_product(b.vec, b.vec))
   * sqrt(list_dot_product(q.qvec, q.qvec))) AS s
  FROM base b, q WHERE b.vec_id <> q.query_id),
exact5 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= 5),
cand AS (SELECT query_id, neighbor_id FROM read_parquet('{ANN_CAND_PLANTED}')),
lsh5 AS (SELECT query_id, neighbor_id FROM (SELECT sc.query_id, sc.neighbor_id,
  row_number() OVER (PARTITION BY sc.query_id ORDER BY sc.s DESC,
   sc.neighbor_id ASC) AS rn
  FROM scored sc JOIN cand USING (query_id, neighbor_id)) WHERE rn <= 5)
SELECT e.query_id, count(l.neighbor_id)::BIGINT AS n_hits,
  round(count(l.neighbor_id) / 5.0, 2) AS recall
FROM exact5 e LEFT JOIN lsh5 l
  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
GROUP BY e.query_id
"""
    ok &= compare("ann_recall", recall_df, rec_sql, con)

    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
