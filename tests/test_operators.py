"""Semantic tests for the operators/ package — these cover what the
DuckDB oracle can't (xxhash64-based signatures, approximate families,
pandas-UDF plumbing) using planted ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xngin_spark.operators import dedup as D
from xngin_spark.operators import multimodal as M
from xngin_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the wide river bank"),  # near dup
        (4, "completely different content about spark sql query optimization engines"),
        (5, "another unrelated document discussing distributed join algorithms today"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    groups = D.exact_dedup(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep[1] == 2  # docs 1+2 collapse
    assert by_keep[3] == 1 and by_keep[4] == 1 and by_keep[5] == 1


def test_exact_dedup_matches_md5_grouping(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    xx = D.exact_dedup(d).select("keep_id", "n_copies").orderBy("keep_id").collect()
    md5 = (
        d.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
        .collect()
    )
    assert xx == md5  # same partition of docs regardless of hash function


def test_minhash_finds_planted_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(docs, threshold=0.3, k=64, bands=16).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # exact dup: identical signature
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught by some band
    assert all(4 not in p and 5 not in p for p in pairs)  # no false positives


def test_simhash_distance(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(docs, max_hamming=64, block_bits=16).collect()
    }
    assert pairs[(1, 2)] == 0  # identical docs → identical simhash
    near = pairs.get((1, 3), 64)
    far = min(pairs.get((1, 4), 64), pairs.get((1, 5), 64))
    assert near < far  # near-dup strictly closer than unrelated docs


def test_ngram_jaccard_exact_values(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.3 < pairs[(1, 3)] < 1.0


def test_cosine_topk_self_match(spark):
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("qid"), "embedding")
    top = S.cosine_topk(emb, q, k=3)
    first = {r["qid"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()}
    assert first == {0: 0, 1: 1}  # every query's own vector ranks first


def test_lsh_recall_on_exact_match(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("qid"), "embedding")
    top = S.cosine_topk_lsh(emb, q, k=1, dim=16, n_planes=8)
    first = {r["qid"]: r["vec_id"] for r in top.filter(F.col("rank") == 1).collect()}
    # identical vector always lands in the query's own bucket → recall@1 = 1
    assert first == {0: 0, 1: 1, 2: 2}


def test_media_feature_plumbing(spark):
    d = spark.createDataFrame([(1, "abc"), (2, "hello world")], "doc_id long, text string")
    media = M.as_media_table(d)
    feats = {r["doc_id"]: r for r in M.extract_media_features(media).collect()}
    assert feats[1]["byte_len"] == 3 and feats[1]["first_byte"] == ord("a")
    assert feats[1]["checksum"] == (ord("a") + ord("b") + ord("c")) % 997
    assert len(feats[2]["feature"]) == 4  # schema-stable fake feature vector


def test_frame_sample_explosion(spark):
    d = spark.createDataFrame([(1, "x" * 300)], "doc_id long, text string")
    frames = M.frame_sample(M.as_media_table(d), every_n_bytes=64, max_frames=8).collect()
    assert len(frames) == 4  # 300 bytes / 64 → frames 0..3
    assert all(len(r["frame_bytes"]) <= 64 for r in frames)
