"""Round-6 additions: vectorized multimodal stages (numpy inside the
pandas boundary), empty/NULL-payload agreement with the DuckDB oracle,
and related hygiene fixes.

Reference parity note: the reference has no multimodal surface; these
operators are the beyond-ref LLM-pipeline family (SURVEY.md §2.8). The
tests here plant the edge shapes (empty payload, NULL text, multi-window
payloads) that the generated testdata may or may not contain in a given
round, so the oracle agreement is pinned independent of data luck.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xngin_spark.operators import multimodal as M

PLANTED = [(1, "abc"), (2, ""), (3, None), (4, "x" * 130), (5, "hello world" * 30)]


@pytest.fixture(scope="module")
def planted_media(spark):
    d = spark.createDataFrame(PLANTED, "doc_id long, text string")
    return M.as_media_table(d)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(PLANTED, columns=["doc_id", "text"]))
    return con


def test_audio_energy_empty_and_null_payloads(planted_media, oracle):
    # Empty ('' and NULL) payloads emit ZERO windows on both engines —
    # the round-5 ADVICE divergence (Spark used to emit an energy-0
    # window where the oracle emitted none).
    got = (
        M.audio_window_energy(planted_media)
        .orderBy("doc_id", "window_no")
        .toPandas()
        .astype("int64")
    )
    assert set(got["doc_id"]) == {1, 4, 5}  # docs 2 (empty) and 3 (NULL) absent
    want = oracle.sql(
        """
        SELECT doc_id, w AS window_no,
               CAST(least(64, length(text) - w*64) AS BIGINT) AS n_samples,
               CAST(COALESCE(list_aggregate(list_transform(
                      range(1, least(64, length(text) - w*64) + 1),
                      j -> CAST(ascii(text[CAST(w*64 + j AS INT)]) AS BIGINT)
                           * CAST(ascii(text[CAST(w*64 + j AS INT)]) AS BIGINT)),
                    'sum'), 0) AS BIGINT) AS energy
        FROM (SELECT doc_id, text,
                     unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT))) AS w
              FROM documents)
        ORDER BY doc_id, window_no
        """
    ).df().astype("int64")
    assert got.reset_index(drop=True).equals(want)


def test_media_features_vectorized_matches_oracle(planted_media, oracle):
    got = (
        M.extract_media_features(planted_media)
        .select("doc_id", "byte_len", "first_byte", "checksum")
        .orderBy("doc_id")
        .toPandas()
        .astype("int64")
    )
    want = oracle.sql(
        """
        WITH b AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
               CAST(COALESCE(ascii(text), 0) AS BIGINT) AS first_byte,
               CAST(COALESCE(list_aggregate(list_transform(
                      generate_series(1, length(text)), i -> ascii(text[i])),
                    'sum'), 0) % 997 AS BIGINT) AS checksum
        FROM b ORDER BY doc_id
        """
    ).df().astype("int64")
    assert got.reset_index(drop=True).equals(want)


def test_media_features_feature_vector_still_stable(planted_media):
    feats = {
        r["doc_id"]: r["feature"]
        for r in M.extract_media_features(planted_media).collect()
    }
    s = sum(b"abc")
    assert feats[1] == [3.0, float(ord("a")), float(s % 997), float(s % 31)]
    assert feats[2] == [0.0, 0.0, 0.0, 0.0]  # empty payload: all-zero feature
    assert feats[3] == [0.0, 0.0, 0.0, 0.0]  # NULL text ≡ empty payload


def test_streaming_sink_names_stable_catalog_flat(spark, sf_dir):
    """Soak guard (round-5 ADVICE): memory-sink temp views must not
    accumulate across repeated streaming-query invocations — the sink
    name is stable per call site and re-registered in place."""
    import xngin_spark.queries as Q

    Q.load_all()
    q = Q.QUERIES["docs_stream_dedup"]
    n1 = q(spark, sf_dir).count()
    views_after_first = {t.name for t in spark.catalog.listTables()}
    n2 = q(spark, sf_dir).count()
    views_after_second = {t.name for t in spark.catalog.listTables()}
    assert n1 == n2
    assert views_after_second == views_after_first  # flat, not growing
    assert "docs_dedup_sink" in views_after_first


def test_run_available_now_rejects_active_name_collision(spark):
    from xngin_spark.streaming.io import run_available_now

    class FakeActive:
        name = "colliding_sink"

    class FakeStreams:
        active = [FakeActive()]

    class FakeSession:
        streams = FakeStreams()

    class FakeDF:
        sparkSession = FakeSession()

    with pytest.raises(ValueError, match="still active"):
        run_available_now(FakeDF(), "colliding_sink")


def test_asof_join_date_axis_tolerance_raises(spark):
    # date + int arithmetic adds DAYS; a seconds tolerance on a DATE
    # axis would silently become a days one — the operator must refuse.
    from xngin_spark.operators.temporal import asof_join

    left = spark.sql("SELECT DATE'2024-01-05' AS ts, 1 AS k")
    right = spark.sql("SELECT DATE'2024-01-01' AS ts, 10 AS v")
    with pytest.raises(ValueError, match="DATE"):
        asof_join(left, right, on="ts", tolerance_sec=600)
    # no tolerance: date axis is fine (pure ordering, no arithmetic)
    row = asof_join(left, right, on="ts").collect()[0]
    assert row["v_r"] == 10


def test_edit_distance_prefilter_is_lossless_at_threshold(spark):
    # round-5 ADVICE: pairs with |Δchars| in (16, 40] and edit distance
    # <= 40 must be FOUND — the prefilter bound now equals the emitted
    # threshold (levenshtein >= length delta, so 40 is lossless).
    import xngin_spark.queries as Q

    Q.load_all()
    # plant via the documents schema the query reads: doc 1 vs doc 2
    # differ by a 30-char suffix → Δchars = 30, edit_dist = 30 <= 40
    base = "x" * 50
    import pandas as pd
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [base, base + "y" * 30],
                "n_chars": [50, 80],
                "lang": ["en", "en"],
                "source": ["s", "s"],
            }
        ).to_parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r.id_a, r.id_b): r.edit_dist
            for r in Q.QUERIES["dedup_edit_distance"](spark, d).collect()
        }
    assert got == {(1, 2): 30}


def test_frame_sample_null_text_consistent(planted_media, oracle):
    got = (
        M.frame_sample(planted_media)
        .select("doc_id", F.col("frame_no").cast("long"))
        .orderBy("doc_id", "frame_no")
        .toPandas()
        .astype("int64")
    )
    want = oracle.sql(
        """
        SELECT doc_id,
               unnest(generate_series(0,
                 least(greatest(CAST(floor(octet_length(
                     CAST(COALESCE(text, '') AS BLOB)) / 64.0) AS INT) - 1, 0), 7)))
                 AS frame_no
        FROM documents ORDER BY 1, 2
        """
    ).df().astype("int64")
    assert got.reset_index(drop=True).equals(want)
