"""Multimodal plumbing: binary media columns, stubbed decode, frame sampling."""

from __future__ import annotations


def test_media_embeddings_feed_similarity_search(spark):
    """End-to-end multimodal dedup path: binary blobs -> feature extraction
    (mapInPandas) -> embedding column -> the SAME similarity operators the
    text/embedding side uses (exact copies score cosine 1.0; ANN top-k runs
    unmodified over the media embedding column)."""
    from pyspark.sql import functions as F

    from biblib_spark.operators.ann import cosine_topk, embedding_near_dup
    from biblib_spark.operators.multimodal import (
        extract_media_features,
        make_synthetic_media,
    )

    media = make_synthetic_media(spark, 60)
    feats = extract_media_features(media).localCheckpoint(eager=True)
    emb = feats.select(
        F.col("media_id").alias("vec_id"), F.col("embedding")
    )

    # every third item repeats the blob of i - i%3 -> exact-copy pairs at
    # cosine 1.0 (the fake decoder is content-deterministic)
    dups = embedding_near_dup(emb, threshold=0.999)
    pairs = {(r.a, r.b) for r in dups.collect()}
    assert (0, 2) in pairs or (0, 1) in pairs  # group of item 0
    assert all(b - b % 3 == a - a % 3 for a, b in pairs)

    topk = cosine_topk(emb, query_ids=[0], k=2).collect()
    assert topk[0].sim >= 0.999  # the copy ranks first

from biblib_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    make_synthetic_media,
    media_dedup_exact,
)


def test_media_features_deterministic(spark):
    media = make_synthetic_media(spark, 60)
    feats = extract_media_features(media, dim=16).collect()
    assert len(feats) == 60
    by_id = {f.media_id: f for f in feats}
    # identical blobs (every 3rd item copies i-2) -> identical embeddings/crc
    assert by_id[2].content_crc == by_id[0].content_crc
    assert by_id[2].embedding == by_id[0].embedding
    assert by_id[1].content_crc != by_id[0].content_crc
    # embeddings are unit-norm floats
    import math

    v = by_id[0].embedding
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5


def test_media_exact_dedup(spark):
    media = make_synthetic_media(spark, 90)
    dups = media_dedup_exact(media).collect()
    # 30 of 90 items are copies -> 30 duplicate groups of size 2
    assert len(dups) == 30
    assert all(d.n_copies == 2 for d in dups)


def test_frame_sample_plan(spark):
    media = make_synthetic_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    assert rows, "some items are videos"
    videos = {r.media_id: r for r in media.filter("kind = 'video'").collect()}
    per_video = {}
    for r in rows:
        per_video.setdefault(r.media_id, []).append(r)
        assert r.ts_ms == r.frame_idx * 1000
    for mid, fr in per_video.items():
        assert len(fr) == videos[mid].duration_ms // 1000 + 1
