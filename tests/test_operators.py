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


def test_cosine_dup_pairs_blocked_matches_unblocked(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)], i % 2) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    blocked = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(emb, threshold=0.3, block_col="label").collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(emb, threshold=0.3).collect()
    }
    # blocking only restricts the candidate set: subset, and exactly the
    # same-label members of the full result
    same_label = {(a, b) for a, b in full if a % 2 == b % 2}
    assert blocked == same_label


def test_ivf_topk_recall(spark):
    import random

    from xngin_spark.operators import clustering as C

    rng = random.Random(3)
    # clustered data: 4 centers, 15 points each
    centers = [[rng.gauss(0, 5) for _ in range(8)] for _ in range(4)]
    rows = []
    for i in range(60):
        c = centers[i % 4]
        rows.append((i, [x + rng.gauss(0, 0.2) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("qid"), "embedding")
    exact = {
        (r.qid, r.vec_id)
        for r in S.cosine_topk(emb, q, k=5).collect()
    }
    ivf = {
        (r.qid, r.vec_id)
        for r in C.cosine_topk_ivf(emb, q, k=5, nlist=4, nprobe=2, max_iter=5).collect()
    }
    # tight clusters: the probed lists must contain the true neighbors
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_kmeans_driver_and_distributed_paths_agree(spark):
    import random

    from xngin_spark.operators import clustering as C

    rng = random.Random(5)
    centers = [[rng.gauss(0, 5) for _ in range(8)] for _ in range(3)]
    rows = [
        (i, [x + rng.gauss(0, 0.2) for x in centers[i % 3]]) for i in range(45)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = C.kmeans_fit(emb, 3, max_iter=6)  # numpy driver path (n <= cap)
    b = C.kmeans_fit(emb, 3, max_iter=6, driver_cap=0)  # distributed loop
    # identical init (same hash order) + identical update/tie rules ->
    # the same fixed point up to float summation order
    for ca, cb in zip(a, b):
        for xa, xb in zip(ca, cb):
            assert abs(xa - xb) < 1e-6


def test_ivf_persisted_prunes_partitions(spark, tmp_path):
    import random

    from xngin_spark.operators import clustering as C

    rng = random.Random(3)
    centers = [[rng.gauss(0, 5) for _ in range(8)] for _ in range(4)]
    rows = [
        (i, [x + rng.gauss(0, 0.2) for x in centers[i % 4]]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # ONE query vector probing 2 of 4 lists — a strict partition subset
    q = emb.filter(F.col("vec_id") < 1).select(F.col("vec_id").alias("qid"), "embedding")
    cents = C.kmeans_fit(emb, 4, max_iter=5)
    path = str(tmp_path / "ivf_index")
    C.ivf_persist(emb, cents, path)

    got = C.cosine_topk_ivf_persisted(spark, path, cents, q, k=5, nprobe=2)
    want = C.cosine_topk_ivf(emb, q, k=5, nlist=4, nprobe=2, centroids=cents)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # the scan must carry an ivf_list partition filter (directory-level
    # pruning) — this is the 100 TB property: probe cost scales with
    # nprobe/nlist, not corpus. inputFiles() lists pre-pruning, so the
    # plan assertion is the listing-level evidence (same convention as
    # tests/test_pruning.py); the direct read of the probed dirs proves
    # the pruned scan still sees every needed row.
    from xngin_spark.plans.explain import partition_filters

    pf = partition_filters(got)
    assert any("ivf_list" in f for f in pf), f"no partition filter: {pf}"


def test_kmeans_partitions_clustered_data(spark):
    import random

    from xngin_spark.operators import clustering as C

    rng = random.Random(5)
    centers = [[10.0] * 4, [-10.0] * 4]
    rows = [
        (i, [x + rng.gauss(0, 0.5) for x in centers[i % 2]]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = C.kmeans_fit(emb, 2, max_iter=6)
    assigned = C.ivf_index(emb, cents)
    # every even id in one list, every odd in the other
    lists = {r.vec_id: r.ivf_list for r in assigned.collect()}
    evens = {lists[i] for i in range(0, 40, 2)}
    odds = {lists[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_salted_join_matches_plain_join(spark):
    from xngin_spark.plans.joins import salted_join

    # skewed fact: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k int, payload int"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(100)], "k int, name string")
    plain = big.join(dim, "k").groupBy("k").count().collect()
    salted = salted_join(big, dim, ["k"], salt=8).groupBy("k").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    # left join keeps unmatched big rows exactly once
    big2 = big.withColumn("k", F.col("k") + 1000)  # no matches
    n_plain = big2.join(dim, "k", "left").count()
    n_salted = salted_join(big2, dim, ["k"], salt=8, how="left").count()
    assert n_plain == n_salted == 1000


def test_single_join_uniqueness_guard(spark):
    from xngin_spark.plans.joins import single_join

    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    # k=1 unique, k=2 duplicated, k=3 absent
    right_ok = spark.createDataFrame([(1, 10), (3, 30)], "rk int, v int")
    ok = single_join(
        left.filter(F.col("k") != 2), right_ok, F.col("k"), F.col("rk"), F.col("v"), "val"
    ).collect()
    assert {(r.k, r.val) for r in ok} == {(1, 10), (3, 30)}
    right_missing = spark.createDataFrame([(1, 10)], "rk int, v int")
    got = {r.k: r.val for r in single_join(
        left, right_missing, F.col("k"), F.col("rk"), F.col("v"), "val"
    ).collect()}
    assert got[2] is None and got[3] is None  # no match -> NULL
    # duplicate match -> runtime error (ExprKind::Attval semantics,
    # doradb-expr/src/expr.rs:42-45)
    right_dup = spark.createDataFrame([(2, 20), (2, 21)], "rk int, v int")
    with pytest.raises(Exception, match="more than one row"):
        single_join(left, right_dup, F.col("k"), F.col("rk"), F.col("v"), "val").collect()


def test_mark_join_wide_right_no_duplication(spark):
    # A right side carrying non-key columns must not duplicate left rows:
    # mark_join distincts only the cond-referenced columns (VERDICT r1 #3).
    from xngin_spark.plans.joins import mark_join

    left = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    wide_right = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (1, "c", 30.0), (9, "z", 0.0)],
        "rk int, tag string, pay double",
    )
    out = mark_join(left, wide_right, left["k"] == wide_right["rk"], mark="m")
    rows = {(r.k, r.m) for r in out.collect()}
    assert out.count() == 3  # one row per left row, no fan-out
    assert rows == {(1, True), (2, False), (3, False)}
    # only left columns + the mark survive
    assert out.columns == ["k", "m"]


def test_mark_join_unresolved_cols_and_no_right_ref(spark):
    from xngin_spark.plans.joins import mark_join

    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, "x")], "rk int, extra string")
    out = mark_join(left, right, F.col("k") == F.col("rk"), mark="m")
    assert {(r.k, r.m) for r in out.collect()} == {(1, True), (2, False)}
    with pytest.raises(ValueError, match="references no column"):
        mark_join(left, right, F.col("k") == F.col("k"), mark="m")


def test_minhash_lsh_bucket_cap(spark):
    # A planted mega-cluster (identical boilerplate) must not reach the
    # pairing join when max_bucket_size caps it; unrelated near-dup
    # pairs in small buckets survive.
    from xngin_spark.operators.dedup import minhash_lsh_pairs, release_persisted

    boiler = [(i, "all rights reserved standard license header text here") for i in range(40)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog tonight again"),
        (101, "the quick brown fox jumps over the lazy dog tonight indeed"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id int, text string")
    uncapped = minhash_lsh_pairs(docs, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert (100, 101) in got
    assert any(a < 40 and b < 40 for a, b in got)  # mega-cluster pairs present
    capped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=10)
    got_capped = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got_capped  # small-bucket pair survives the cap
    assert not any(a < 40 and b < 40 for a, b in got_capped)
    release_persisted()


@pytest.mark.parametrize(
    "key,val",
    [
        ("spark.sql.ansi.enabled", "true"),
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.codegen.wholeStage", "false"),
        ("spark.sql.adaptive.enabled", "false"),
    ],
)
def test_single_join_guard_conf_matrix(spark, key, val):
    # SURVEY §7 hard-point 3: the Attval multi-row error must hold (and
    # the happy path stay correct) regardless of session conf — the
    # guard is an explicit raise_error expression, not a legacy-config-
    # dependent Spark behavior, and this pins that.
    from xngin_spark.plans.joins import single_join

    old = spark.conf.get(key, None)
    spark.conf.set(key, val)
    try:
        left = spark.createDataFrame([(1,), (2,)], "k int")
        right = spark.createDataFrame([(1, 10)], "rk int, v int")
        got = {r.k: r.val for r in single_join(
            left, right, F.col("k"), F.col("rk"), F.col("v"), "val"
        ).collect()}
        assert got == {1: 10, 2: None}
        dup = spark.createDataFrame([(1, 10), (1, 11)], "rk int, v int")
        with pytest.raises(Exception, match="more than one row"):
            single_join(left, dup, F.col("k"), F.col("rk"), F.col("v"), "val").collect()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_quantified_all_boundary_semantics(spark):
    # empty subquery -> TRUE; NULL x -> NULL; counterexample -> FALSE;
    # no counterexample but NULLs in subquery -> NULL
    from xngin_spark.plans.joins import quantified_all

    left = spark.createDataFrame([(1, 5.0), (2, None), (3, 100.0)], "k int, x double")
    empty = spark.createDataFrame([], "v double")
    out = {r.k: r.a for r in quantified_all(
        left, F.col("x"), empty, "v", ">", "a"
    ).collect()}
    assert out == {1: True, 2: True, 3: True}  # > ALL (empty) is TRUE even for NULL x
    sub = spark.createDataFrame([(10.0,), (None,)], "v double")
    out = {r.k: r.a for r in quantified_all(
        left, F.col("x"), sub, "v", ">", "a"
    ).collect()}
    assert out == {1: False, 2: None, 3: None}
    nonull = spark.createDataFrame([(10.0,), (50.0,)], "v double")
    out = {r.k: r.a for r in quantified_all(
        left, F.col("x"), nonull, "v", ">", "a"
    ).collect()}
    assert out == {1: False, 2: None, 3: True}
    out = {r.k: r.a for r in quantified_all(
        left, F.col("x"), nonull, "v", "<", "a"
    ).collect()}
    assert out == {1: True, 2: None, 3: False}


def test_quantize_int8_bounds_and_reconstruction(spark):
    from xngin_spark.operators.quantize import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "vec_id int, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    for r in rows.values():
        assert all(-127 <= q <= 127 for q in r.qvec)  # int8 range
        assert r.max_abs_err <= r.scale / 2 + 1e-12  # round-half bound
    assert rows[1].qvec == [64, -127, 32]
    assert rows[2].qvec == [0, 0, 0]  # zero vector guarded, no div-by-zero
    assert rows[3].qvec == [127, -127, 64]


def test_redact_pii_families(spark):
    from xngin_spark.operators.textstats import pii_hits, redact_pii

    df = spark.createDataFrame(
        [("mail a.b+c@x-corp.io here", 1),
         ("server at 192.168.001.25 port", 1),
         ("call 555-867-5309 now", 1),
         ("no pii at all", 0)],
        "text string, expected int",
    )
    got = df.select(
        redact_pii(F.col("text")).alias("clean"),
        pii_hits(F.col("text")).alias("n"),
        "expected",
    ).collect()
    for r in got:
        assert r.n == r.expected
        assert "@" not in r.clean and "192.168" not in r.clean and "867-5309" not in r.clean


def test_asof_join_semantics(spark):
    from xngin_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "u"), (2, 20.0, "u"), (3, 5.0, "v")], "id int, ts double, k string"
    )
    right = spark.createDataFrame(
        [(10.0, "u", 100.0), (15.0, "u", 150.0), (30.0, "v", 300.0)],
        "ts double, k string, v double",
    )
    out = {r.id: r.v_r for r in asof_join(
        left, right, on="ts", by="k", value_cols=["v"]
    ).collect()}
    assert out[1] == 100.0  # tie at ts=10 is inclusive
    assert out[2] == 150.0  # latest at-or-before 20
    assert out[3] is None   # no prior right row for key v


def test_range_join_boundaries(spark):
    from xngin_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, 100.0, "u")], "id int, ts double, k string")
    right = spark.createDataFrame(
        [(10, 99.0, "u"), (11, 100.0, "u"), (12, 400.0, "u"),
         (13, 401.0, "u"), (14, 250.0, "x")],
        "rid int, ts double, k string",
    )
    got = {r.rid_r for r in range_join(
        left, right, on="ts", by="k", lower=0, upper=300
    ).collect()}
    # inclusive bounds [ts, ts+300]; other keys and out-of-range excluded
    assert got == {11, 12}


def test_connected_components_multihop(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), triangle
    # 10-11-12, isolated 99 — the LSH-pair-graph shapes with no SQL oracle
    from xngin_spark.operators.corpus import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 12, 99)], "id long")
    got = {r.id: r.component for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_path_graph_converges(spark):
    # 20-node path: worst-case diameter for min-label propagation (the
    # crawl-dup chain shape). Label 0 must walk the whole chain.
    from xngin_spark.operators.corpus import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(20)], "id long")
    got = {
        r.id: r.component
        for r in connected_components(
            edges, nodes, max_iter=25, driver_cap=0  # force distributed loop
        ).collect()
    }
    assert got == {i: 0 for i in range(20)}


def test_driver_components_string_ids_and_primitive_collect(spark):
    # the driver short-circuit must (a) agree with the distributed loop
    # on non-integer ids (the Arrow collect path handles strings), and
    # (b) collect primitive columns, not Row objects — asserted by a
    # Python-heap bound far below what 60k Rows would cost
    import tracemalloc

    from xngin_spark.operators.corpus import connected_components

    pairs = [(f"d{i:05d}", f"d{i + 1:05d}") for i in range(0, 60_000, 2)]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    nodes = spark.createDataFrame(
        [(f"d{i:05d}",) for i in range(60_001)], "id string"
    )
    tracemalloc.start()
    driver = {
        r.id: r.component for r in connected_components(edges, nodes).collect()
    }
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # 30k string edges as primitives: ~10 MB; as Row objects: >30 MB.
    # (collect() of the RESULT dominates either way at this size, so
    # bound generously — the real check is it doesn't balloon.)
    assert peak < 60 * 1024 * 1024, f"driver CC collect peaked at {peak} B"
    dist = {
        r.id: r.component
        for r in connected_components(
            edges, nodes, max_iter=25, driver_cap=0
        ).collect()
    }
    assert driver == dist


def test_connected_components_nonconvergence_raises(spark):
    # same path graph with too few iterations: silent exit would return
    # wrong components — must raise instead
    import pytest as _pytest

    from xngin_spark.operators.corpus import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(20)], "id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_iter=2, driver_cap=0)


def test_release_checkpoint_frees_storage(spark):
    # df.rdd.unpersist() is a documented no-op (it wraps a NEW rdd over
    # the checkpointed plan); release_checkpoint must drop the actually
    # persisted internal RDD or iterative operators accumulate one
    # checkpoint per iteration for the life of the session
    from xngin_spark.operators.util import release_checkpoint

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    ck = spark.range(100).selectExpr("id", "id * 2 AS x").localCheckpoint(eager=True)
    assert jsc.getPersistentRDDs().size() == before + 1
    # the broken path really is a no-op — guard against "fixed by accident"
    ck.rdd.unpersist()
    assert jsc.getPersistentRDDs().size() == before + 1
    release_checkpoint(ck)
    assert jsc.getPersistentRDDs().size() == before


def test_iterative_operators_do_not_leak_checkpoints(spark):
    # connected_components checkpoints per iteration; all but the
    # returned label set must be released by the time it returns
    from xngin_spark.operators.corpus import connected_components

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
    connected_components(edges, nodes, max_iter=15, driver_cap=0).collect()
    # the final labels checkpoint survives (the caller holds it); the
    # per-iteration + edge-list ones must be gone
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_sequence_pack_fills_budget(spark):
    from xngin_spark.operators.corpus import sequence_pack

    df = spark.createDataFrame(
        [(i, "s", 1000) for i in range(10)], "doc_id long, source string, n_tokens long"
    )
    got = {r.doc_id: r.pack_id for r in sequence_pack(df, budget=2048).collect()}
    # start-offset binning: doc i starts at offset 1000*i, so its pack
    # is floor(1000*i / 2048) — three docs start inside window 0
    assert got == {i: (1000 * i) // 2048 for i in range(10)}


def test_dedup_pipeline_keeper_semantics(spark, sf_dir):
    from pyspark.sql import functions as F2

    import xngin_spark.queries as Q

    Q.load_all()
    out = Q.QUERIES["dedup_pipeline"](spark, sf_dir)
    out.cache()
    try:
        # exactly one keeper per component, and it is the min doc_id
        per_comp = out.groupBy("component").agg(
            F2.sum(F2.col("is_keeper").cast("int")).alias("n_keep"),
            F2.min("doc_id").alias("lo"),
        )
        assert per_comp.filter(F2.col("n_keep") != 1).count() == 0
        bad = (
            out.filter(F2.col("is_keeper"))
            .join(per_comp, "component")
            .filter(F2.col("doc_id") != F2.col("lo"))
        )
        assert bad.count() == 0
        # identical-text docs always share a component
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        j = d.select(F2.md5("text").alias("fp"), "doc_id").join(out, "doc_id")
        assert (
            j.groupBy("fp").agg(F2.countDistinct("component").alias("nc"))
            .filter(F2.col("nc") > 1)
            .count()
            == 0
        )
    finally:
        out.unpersist()


def test_pq_recall_against_exact(spark, sf_dir):
    # ADC top-20 must substantially overlap the exact L2 top-20 — PQ is
    # lossy, but m=4/k=16 on 64-dim clustered embeddings should keep
    # most true neighbors
    from xngin_spark.operators.clustering import pq_encode, pq_fit, pq_search

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [0.25 if i % 3 == 0 else -0.125 for i in range(64)]
    books = pq_fit(e.filter(F.col("vec_id") % 7 == 0), dim=64, m=4, k=16, max_iter=3)
    approx = {r.vec_id for r in pq_search(pq_encode(e, books), books, probe, k=20).collect()}

    q = F.array(*[F.lit(float(x)) for x in probe])
    l2 = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: (a.cast("double") - b) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = {
        r.vec_id
        for r in e.select("vec_id", l2.alias("d"))
        .orderBy(F.col("d").asc(), "vec_id")
        .limit(20)
        .collect()
    }
    recall = len(approx & exact) / 20.0
    assert recall >= 0.3, f"PQ recall {recall} too low"


def test_pq_fit_tiny_sample_clamps_k(spark):
    # fewer training rows than k: codebooks clamp instead of indexing
    # empty slots (ANSI element_at error) — r2 advice item
    from xngin_spark.operators.clustering import pq_encode, pq_fit

    df = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    books = pq_fit(df, dim=4, m=2, k=16, max_iter=1)
    assert all(1 <= len(bk) <= 3 for bk in books)
    assert pq_encode(df, books).count() == 3


def test_pq_fit_deterministic_codebooks(spark):
    # collect() row order must not leak into codebook slot order
    from xngin_spark.operators.clustering import pq_fit

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), float(i % 7), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    b1 = pq_fit(df, dim=4, m=2, k=4, max_iter=2)
    b2 = pq_fit(df.repartition(7), dim=4, m=2, k=4, max_iter=2)
    assert b1 == b2


def test_bloom_no_false_negatives_and_fp_bound(spark):
    # the Bloom contract: every member must test positive (the screen
    # may over-flag but can NEVER miss); FP rate near the sized target
    from pyspark.sql import functions as F

    from xngin_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        optimal_params,
    )

    members = spark.range(0, 2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    m, k = optimal_params(2000, 0.01)
    bloom = bloom_build(members, "k", m, k).localCheckpoint(eager=True)
    missed = (
        bloom_might_contain(members, "k", bloom, m, k)
        .filter(~F.col("might_contain"))
        .count()
    )
    assert missed == 0, "Bloom filter produced false negatives"
    others = spark.range(0, 10000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("k")
    )
    fp = (
        bloom_might_contain(others, "k", bloom, m, k)
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp / 10000 < 0.03, f"FP rate {fp/10000} far above the 1% sizing"


def test_bloom_probe_plan_is_shuffle_free(spark):
    # the probe side must stay map-side: k broadcast joins, and with a
    # pinned filter there is no hash exchange anywhere in the plan
    from pyspark.sql import functions as F

    from xngin_spark.operators.bloom import bloom_build, bloom_might_contain

    members = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(members, "k", 1 << 14, 5).localCheckpoint(eager=True)
    probe = bloom_might_contain(members, "k", bloom, 1 << 14, 5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 5
    assert "Exchange hashpartitioning" not in plan


def test_bloom_seen_filter_flags_planted_duplicates(spark, sf_dir):
    # plant exact cross-snapshot duplicates and require the query's
    # no-false-negative guarantee to hold end-to-end
    from pyspark.sql import functions as F

    from xngin_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        optimal_params,
    )
    from xngin_spark.queries.tpch import T

    d = T(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % 3 == 0).select("text")
    # current snapshot re-crawls some previous pages verbatim
    planted = prev.limit(20)
    cur = d.filter(F.col("doc_id") % 3 != 0).select("text").union(planted)
    n = max(prev.count(), 1)
    m, k = optimal_params(n, 0.01)
    bloom = bloom_build(prev, "text", m, k).localCheckpoint(eager=True)
    flagged = bloom_might_contain(cur, "text", bloom, m, k)
    missed = (
        flagged.join(planted, "text", "leftsemi")
        .filter(~F.col("might_contain"))
        .count()
    )
    assert missed == 0


def test_temperature_mix_rebalances_toward_tail(spark):
    # one head domain (900 docs) vs two tail domains (50 each): under
    # alpha=0.5 the tail keeps a much larger FRACTION than the head —
    # the whole point of temperature resampling
    from pyspark.sql import functions as F

    from xngin_spark.operators.corpus import temperature_mix

    rows = [(i, "head", f"head doc {i} {i*i}") for i in range(900)]
    rows += [(1000 + i, "tail_a", f"tail a doc {i} {i*i}") for i in range(50)]
    rows += [(2000 + i, "tail_b", f"tail b doc {i} {i*i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = temperature_mix(df, domain_col="source", target_total=200.0)
    frac = {
        r.source: r.k / r.n
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(
            df.groupBy("source").agg(F.count(F.lit(1)).alias("n")), "source"
        )
        .collect()
    }
    assert frac["tail_a"] > 2 * frac["head"]
    assert frac["tail_b"] > 2 * frac["head"]
    # rates are capped at 1: a tiny domain can be kept whole, never
    # duplicated, and every kept row is an input row
    assert kept.count() <= df.count()
    assert kept.join(df, ["doc_id"], "left_anti").count() == 0


def test_md5_long_matches_reference_md5(spark):
    import hashlib

    vals = ["hello", "a b c", "the quick brown fox"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", D.md5_long(F.col("s")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def test_minhash_portable_finds_planted_near_dup(docs):
    # the oracle-checked md5_long variant must make the same dedup
    # calls as the xxhash64 production path on planted ground truth
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(
            docs, threshold=0.3, k=16, bands=8, portable=True
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical signature
    assert all(4 not in p and 5 not in p for p in pairs)  # no false positives


def test_passage_dup_stats_planted(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " one two three four"),  # 12 tokens, shared at pos 1
            (2, "x y z " + shared),  # 11 tokens, shared at pos 4
            (3, "totally different words with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in D.passage_dup_stats(docs, w=8).collect()}
    assert rows[1]["n_windows"] == 5 and rows[2]["n_windows"] == 4
    assert rows[1]["n_dup_windows"] == 1  # exactly the planted passage
    assert rows[2]["n_dup_windows"] == 1
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["dup_frac"] == 0.0
    assert abs(rows[1]["dup_frac"] - 0.2) < 1e-12


def test_passage_dup_short_doc_single_window(spark):
    # docs shorter than w collapse to one whole-doc window (greatest(...,1));
    # two identical short docs must therefore count as duplicated
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "other text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in D.passage_dup_stats(docs, w=8).collect()}
    assert rows[1]["n_windows"] == 1 and rows[1]["n_dup_windows"] == 1
    assert rows[3]["n_dup_windows"] == 0


def test_dup_span_extract_planted(spark):
    shared = " ".join(f"s{i}" for i in range(1, 11))  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "p1 p2 " + shared + " q1 q2"),  # shared at token pos 3..12
            (2, shared + " r1 r2 r3"),          # shared at token pos 1..10
            (3, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: r for r in D.dup_span_extract(docs, w=8).collect()
    }
    # doc1: 8-windows fully inside [3,12] start at 3,4,5 -> one island
    assert spans[1]["span_start"] == 3 and spans[1]["span_end"] == 12
    assert spans[1]["span_tokens"] == 10 and spans[1]["n_dup_windows"] == 3
    # doc2: windows start at 1,2,3 -> span [1,10]
    assert spans[2]["span_start"] == 1 and spans[2]["span_end"] == 10
    assert spans[2]["n_dup_windows"] == 3
    assert 3 not in spans  # no duplicated content -> no span row


def test_dup_span_extract_two_islands(spark):
    a = " ".join(f"a{i}" for i in range(1, 9))  # 8 tokens
    b = " ".join(f"b{i}" for i in range(1, 9))  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, a + " x1 x2 x3 x4 x5 " + b),  # a at 1..8, b at 14..21
            (2, a + " y1 y2 y3 y4 y5 y6 y7"),
            (3, "z1 z2 z3 z4 z5 z6 z7 " + b),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["span_start"], r["span_end"])
        for r in D.dup_span_extract(docs, w=8).collect()
        if r["doc_id"] == 1
    )
    # separated duplicated regions must stay SEPARATE spans
    assert rows == [(1, 8), (14, 21)]


def test_dup_span_removal_planted(spark):
    shared = " ".join(f"s{i}" for i in range(1, 11))  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "p1 p2 " + shared + " q1 q2"),  # span at 3..12
            (2, shared + " r1 r2 r3"),          # span at 1..10
            (3, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in D.dup_span_removal(docs, w=8).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert rows[1]["n_removed"] == 10
    assert rows[1]["clean_fp"] == md5("p1 p2 q1 q2")
    assert rows[2]["n_removed"] == 10
    assert rows[2]["clean_fp"] == md5("r1 r2 r3")
    assert rows[3]["n_removed"] == 0  # untouched doc keeps its text
    assert rows[3]["clean_fp"] == md5(
        "totally different words with no overlap at all here now"
    )


def test_dup_span_removal_full_doc_empties_cleanly(spark):
    # two identical docs: the whole text is one duplicated span; the
    # rebuilt text must be EMPTY on both engines (md5('') convention)
    import hashlib

    t = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in D.dup_span_removal(docs, w=8).collect()}
    assert rows[1]["n_removed"] == 12
    assert rows[1]["clean_fp"] == hashlib.md5(b"").hexdigest()


def test_gopher_signals_planted(spark):
    from xngin_spark.operators import textstats as X

    passing = "the " + " ".join(f"word{i}" for i in range(60))  # 61 words, has 'the'+'a'? no
    # ensure two distinct stopwords present
    passing = "the a " + " ".join(f"word{i}" for i in range(60))
    short = "the a tiny doc"                                  # <50 words
    longwords = "the a " + " ".join("x" * 30 for _ in range(60))  # mean len >10
    symbols = "the a " + " ".join("#" * 1 for _ in range(60))  # symbol ratio high, non-alpha
    docs = spark.createDataFrame(
        [(1, passing), (2, short), (3, longwords), (4, symbols)],
        "doc_id long, text string",
    )
    sig = X.gopher_signals(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[c.alias(n) for n, c in sig.items()]
        ).collect()
    }
    assert rows[1]["gopher_pass"] is True
    assert rows[1]["n_distinct_stop"] >= 2 and rows[1]["alpha_frac"] > 0.9
    assert rows[2]["gopher_pass"] is False      # word-count floor
    assert rows[3]["gopher_pass"] is False      # mean word length cap
    assert rows[3]["mean_word_len"] > 10.0
    assert rows[4]["gopher_pass"] is False      # symbols + non-alpha words
    assert rows[4]["symbol_ratio"] > 0.1
    assert rows[4]["alpha_frac"] < 0.8


def test_asof_join_tolerance(spark):
    from xngin_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "u"), (2, 100.0, "u"), (3, 5.0, "v")],
        "id int, ts double, k string",
    )
    right = spark.createDataFrame(
        [(9.0, "u", 90.0), (30.0, "u", 300.0)], "ts double, k string, v double"
    )
    out = {r.id: r.v_r for r in asof_join(
        left, right, on="ts", by="k", value_cols=["v"], tolerance_sec=10
    ).collect()}
    assert out[1] == 90.0  # gap 1 <= 10: fresh match survives
    assert out[2] is None  # latest prior at 30 is 70 stale: masked
    assert out[3] is None  # no prior row at all: still NULL


def test_semantic_dedup_collapses_duplicate_vectors(spark):
    # SemDeDup composition: identical vectors must land in the same
    # k-means cluster (same nearest centroid), pair at cosine 1.0, and
    # collapse to one keeper; a far-away vector stays its own component
    import random

    from xngin_spark.operators.clustering import _nearest, kmeans_fit
    from xngin_spark.operators.corpus import connected_components
    from pyspark.sql import functions as F

    rng = random.Random(7)
    dup = [1.0, 0.0] * 8
    far = [-1.0, 0.5] * 8
    rows = [(1, dup), (2, dup), (3, far)] + [
        (10 + i, [rng.uniform(-0.1, 0.1) for _ in range(16)]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=3, max_iter=4)
    assigned = emb.withColumn("cluster", _nearest(F.col("embedding"), cents)["c"])
    same = {
        r.vec_id: r.cluster for r in assigned.filter(F.col("vec_id") < 3).collect()
    }
    assert same[1] == same[2]  # identical vectors share a cluster
    pairs = S.cosine_dup_pairs(assigned, threshold=0.95, block_col="cluster")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = {
        r.vec_id: r.component
        for r in connected_components(
            edges, emb.select("vec_id"), id_col="vec_id"
        ).collect()
    }
    assert comps[1] == comps[2] == 1  # collapsed, keeper = min id
    assert comps[3] == 3  # far vector untouched


def test_minhash_index_persist_and_screen(spark, tmp_path, docs):
    # ingest-dedup layout: index the corpus once, then screen a new
    # batch against the stored buckets without re-reading corpus text
    path = str(tmp_path / "mh_index")
    D.minhash_index_persist(docs, path)
    import os

    assert os.path.isdir(f"{path}/sigs") and os.path.isdir(f"{path}/bands")

    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog near the river bank"),
            (102, "entirely novel sentence with fresh vocabulary and zero overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    hits = {
        (r.new_id, r.corpus_id): r.est_jaccard
        for r in D.minhash_screen(new, path, threshold=0.5).collect()
    }
    D.release_persisted()
    # 101 duplicates corpus docs 1/2 exactly -> identical signatures
    assert hits[(101, 1)] == 1.0 and hits[(101, 2)] == 1.0
    assert all(nid != 102 for nid, _ in hits), "novel doc must not match"
    # re-persist is idempotent (overwrite mode)
    D.minhash_index_persist(docs, path)
    again = {
        (r.new_id, r.corpus_id)
        for r in D.minhash_screen(new, path, threshold=0.5).collect()
    }
    D.release_persisted()
    assert again == set(hits)
    # an index persisted under a NON-default id column screens with the
    # persist-time name recorded in the meta, not the caller's default
    path2 = str(tmp_path / "mh_index_uid")
    D.minhash_index_persist(
        docs.withColumnRenamed("doc_id", "uid"), path2, id_col="uid"
    )
    uid_hits = {
        (r.new_id, r.corpus_id)
        for r in D.minhash_screen(new, path2, threshold=0.5).collect()
    }
    D.release_persisted()
    assert {(101, 1), (101, 2)} <= uid_hits
    # an index without metadata must refuse to screen (guessed banding
    # constants silently match nothing)
    import shutil

    shutil.rmtree(f"{path}/_meta")
    import pytest

    with pytest.raises(ValueError):
        D.minhash_screen(new, path, threshold=0.5)


def test_asof_join_null_value_row_semantics(spark):
    # ASOF joins the latest ROW; a NULL value in that row must come
    # through as NULL, not reach back to an older non-NULL value
    from xngin_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100.0, "u")], "id int, ts double, k string")
    right = spark.createDataFrame(
        [(5.0, "u", 1.0), (95.0, "u", None)], "ts double, k string, v double"
    )
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"]).collect()
    assert out[0].v_r is None  # latest row (ts=95) carries NULL


def test_asof_join_tolerance_no_stale_leak(spark):
    # regression (review finding): with per-column fills, the mask
    # tested the fresh row's timestamp while the VALUE filled past its
    # NULL back to a 95s-stale row — the struct fill makes both agree
    from xngin_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100.0, "u")], "id int, ts double, k string")
    right = spark.createDataFrame(
        [(5.0, "u", 1.0), (95.0, "u", None)], "ts double, k string, v double"
    )
    out = asof_join(
        left, right, on="ts", by="k", value_cols=["v"], tolerance_sec=10
    ).collect()
    assert out[0].v_r is None  # matched row is fresh but its value is NULL


def test_bm25_planted_relevance(spark):
    from xngin_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "apple apple apple pear plum"),
            (1, "apple banana cherry date fig"),
            (2, "banana cherry date fig grape"),
            (3, "kiwi " * 40 + "apple"),  # long doc: length-normalized down
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "apple")], "qid long, term string")
    rows = bm25_topk(docs, q, k=10).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)]
    # doc2 has no 'apple' -> absent; tf=3 beats tf=1; the padded doc's
    # single hit is punished by length normalization
    assert 2 not in ranked
    assert ranked[0] == 0
    assert ranked.index(1) < ranked.index(3)
    # rare-term idf dominates common-term idf at equal tf
    q2 = spark.createDataFrame(
        [(0, "apple"), (1, "plum")], "qid long, term string"
    )
    scores = {
        (r.qid, r.doc_id): r.score for r in bm25_topk(docs, q2, k=10).collect()
    }
    assert scores[(1, 0)] > scores[(0, 0)]  # plum (df=1) > apple (df=3) on doc0
