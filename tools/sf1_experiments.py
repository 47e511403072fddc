#!/usr/bin/env python
"""Round-12 sf1 re-evaluation of the two round-11 negative results
(r11 verdict "Next round" #8): does the local-concurrency argument that
killed them at sf0.1 invert once scans are 10x bigger?

1. constraint_check melt-fusion — lineitem's three FK legs as ONE scan
   (melt to (tag, key) + one anti-join against tagged parent keys)
   versus the shipped three-concurrent-legs shape.
2. setsim_prefix_join persist — materialize the reused toks/per_doc
   frames versus recompute-under-exchange-reuse, over the FULL corpus
   (the registered query is input-bounded, so the operator is measured
   unbounded here).

Interleaved same-session A/B (the r11 protocol); equality of results is
asserted every round, so the fused variant can never silently drift.

Usage: python tools/sf1_experiments.py /tmp/xngin_scale/sf1 [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def melt_constraint_check(spark, sf_dir):
    """Fused variant: PK checks unchanged; lineitem's three FK legs
    read the table ONCE (tinyint tag — the r11 second cut), all other
    FK legs unchanged."""
    from xngin_spark.constraints import (
        TPCH_FOREIGN_KEYS,
        TPCH_PRIMARY_KEYS,
        fk_report,
        pk_report,
    )
    from xngin_spark.queries.tpch import T

    parts = [
        pk_report(T(spark, sf_dir, t), t, cols) for t, cols in TPCH_PRIMARY_KEYS
    ]
    li_legs = [
        (i, c, cc, p, pc)
        for i, (c, cc, p, pc) in enumerate(TPCH_FOREIGN_KEYS)
        if c == "lineitem"
    ]
    parts += [
        fk_report(
            T(spark, sf_dir, c), cc, T(spark, sf_dir, p), pc, f"fk_{c}_{cc}"
        )
        for c, cc, p, pc in TPCH_FOREIGN_KEYS
        if c != "lineitem"
    ]
    li = T(spark, sf_dir, "lineitem")
    melted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("tinyint").alias("tag"),
                        F.col(cc).alias("k"),
                    )
                    for j, (_, _, cc, _, _) in enumerate(li_legs)
                ]
            )
        ).alias("e")
    ).select("e.tag", "e.k").filter(F.col("k").isNotNull()).distinct()
    parents = None
    for j, (_, _, cc, p, pc) in enumerate(li_legs):
        pk = (
            T(spark, sf_dir, p)
            .select(F.col(pc).alias("k"))
            .distinct()
            .select(F.lit(j).cast("tinyint").alias("tag"), "k")
        )
        parents = pk if parents is None else parents.unionByName(pk)
    orphans = melted.join(F.broadcast(parents), ["tag", "k"], "left_anti")
    tag_name = {
        j: f"fk_lineitem_{cc}" for j, (_, _, cc, _, _) in enumerate(li_legs)
    }
    name_expr = F.element_at(
        F.array(*[F.lit(tag_name[j]) for j in range(len(li_legs))]),
        F.col("tag").cast("int") + 1,
    )
    # one row per leg even when a leg has zero orphans
    spine = None
    for j in range(len(li_legs)):
        row = spark.range(1).select(F.lit(j).cast("tinyint").alias("tag"))
        spine = row if spine is None else spine.unionByName(row)
    counts = orphans.groupBy("tag").agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    )
    fused = (
        spine.join(counts, "tag", "left")
        .select(
            name_expr.alias("constraint"),
            F.lit("foreign_key").alias("kind"),
            F.coalesce("violations", F.lit(0)).cast("long").alias("violations"),
        )
    )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.unionByName(fused)


def setsim_persist(spark, sf_dir, threshold=0.9):
    """setsim_prefix_join with toks/per_doc persisted (the r11
    experiment), over the FULL corpus."""
    from pyspark import StorageLevel

    import xngin_spark.operators.dedup as D
    from xngin_spark.operators.textstats import tokens
    from xngin_spark.operators.util import fan_out
    from xngin_spark.queries.tpch import T

    df = T(spark, sf_dir, "documents")
    id_col, text_col = "doc_id", "text"
    toks = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(tokens(F.col(text_col))).alias("ta"),
        )
        .filter(F.size("ta") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ex = toks.select("id", F.explode("ta").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        ex.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("ord"),
            F.count(F.lit(1)).cast("long").alias("sz"),
        )
        .select(
            "id",
            "sz",
            F.slice(
                F.col("ord"),
                1,
                (
                    F.col("sz")
                    - F.floor(F.lit(threshold) * F.col("sz"))
                    + F.lit(1)
                ).cast("int"),
            ).alias("prefix"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    D.track_persisted(toks)
    D.track_persisted(per_doc)
    pa = per_doc.select(
        F.col("id").alias("id_a"), F.col("sz").alias("la"),
        F.explode("prefix").alias("p"),
    ).select("id_a", "la", F.col("p.tok").alias("tok"))
    pb = per_doc.select(
        F.col("id").alias("id_b"), F.col("sz").alias("lb"),
        F.explode("prefix").alias("p"),
    ).select("id_b", "lb", F.col("p.tok").alias("tok"))
    cands = (
        pa.join(pb, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("lb").cast("double") >= F.lit(threshold) * F.col("la"))
            & (F.col("lb") * F.lit(threshold) <= F.col("la").cast("double"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    t_a = toks.select(F.col("id").alias("id_a"), F.col("ta").alias("set_a"))
    t_b = toks.select(F.col("id").alias("id_b"), F.col("ta").alias("set_b"))
    return (
        cands.join(t_a, "id_a")
        .join(t_b, "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("set_a", "set_b")).cast("long").alias("inter"),
            F.size("set_a").cast("long").alias("sz_a"),
            F.size("set_b").cast("long").alias("sz_b"),
        )
        .select(
            "id_a", "id_b", "inter",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    only = set(sys.argv[3:])
    from xngin_spark import queries as Q
    from xngin_spark.operators.dedup import (
        release_checkpoints,
        release_persisted,
        setsim_prefix_join,
    )
    from xngin_spark.queries.tpch import T
    from xngin_spark.session import get_spark

    Q.load_all()
    spark = get_spark("xngin_sf1_exp")
    sc = spark.sparkContext

    experiments = {
        "constraint_check": (
            lambda: Q.QUERIES["constraint_check"](spark, sf_dir),
            lambda: melt_constraint_check(spark, sf_dir),
            ("current", "melt"),
        ),
        "setsim_full": (
            lambda: setsim_prefix_join(
                T(spark, sf_dir, "documents"), threshold=0.9
            ),
            lambda: setsim_persist(spark, sf_dir),
            ("current", "persist"),
        ),
    }
    if only:
        experiments = {k: v for k, v in experiments.items() if k in only}

    # equality proof for the melt rewrite (it restructures the PLAN, so
    # prove values). The setsim persist variant differs ONLY in
    # StorageLevel materialization — persist cannot change row values —
    # and the r11 round proved the two variants row-equal at sf0.1; a
    # full-corpus equality re-proof at sf1 costs ~30 min of pure count
    # and is skipped.
    if "constraint_check" in experiments:
        cur_cc = sorted(
            map(tuple, Q.QUERIES["constraint_check"](spark, sf_dir).collect())
        )
        melt_cc = sorted(
            map(tuple, melt_constraint_check(spark, sf_dir).collect())
        )
        assert cur_cc == melt_cc, "melt variant diverges!"
        print(f"constraint_check equality OK ({len(cur_cc)} rows)", flush=True)

    results = {}
    for name, (cur, var, tags) in experiments.items():
        exp_rounds = rounds if name == "constraint_check" else min(rounds, 2)
        rows = []
        for rnd in range(exp_rounds + 1):
            rec = {}
            for tag, builder in zip(tags, (cur, var)):
                sc.setJobDescription(f"sf1:{name}:{tag}:r{rnd}")
                t0 = time.perf_counter()
                builder().write.mode("overwrite").format("noop").save()
                rec[tag] = round(time.perf_counter() - t0, 3)
                release_persisted()
                release_checkpoints()
            if rnd > 0:
                rows.append(rec)
            print(f"{name} r{rnd}: {rec}", flush=True)
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        results[name] = {
            tags[0]: med([r[tags[0]] for r in rows]),
            tags[1]: med([r[tags[1]] for r in rows]),
            "variant_faster_rounds": sum(
                1 for r in rows if r[tags[1]] < r[tags[0]]
            ),
            "rounds": rows,
        }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
