"""Skew handling: AQE splits a pathologically hot join key at runtime,
and the deterministic salted join produces identical results to the
unsalted plan. These pin the two mechanisms SCALING.md claims for skewed
keys at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed_frames(spark):
    """200k-row fact where 50% of rows share ONE key, joined to a 10k dim."""
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 10_000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(0, 10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return fact, dim


def test_aqe_skew_join_splits_hot_partition(spark, skewed_frames):
    fact, dim = skewed_frames
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's QueryExecution (count() would
        # clone it into a separate execution and leave this plan unfinalized).
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the rewritten join and the split shuffle read.
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_unsalted(spark, skewed_frames):
    """Salting changes the shuffle distribution, never the result."""
    from gluettalax_spark.operators.skew import salted_join

    fact, dim = skewed_frames
    salted = salted_join(fact, dim, "k", n_salts=8)
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    a = salted.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    b = plain.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# --------------------------------------------------------------------------
# Band-bucket cap: adversarial boilerplate corpus (round-4 verdict item 5)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def boilerplate_corpus(spark, tmp_path_factory):
    """1500 docs, 40% sharing ONE exact template text (600-doc band
    buckets — far past MAX_BAND_BUCKET=512), the rest unique. Written as
    documents.parquet so the dedup builders read it like a fixture dir."""
    d = tmp_path_factory.mktemp("boiler")
    rows = []
    template = " ".join(f"tok{i % 13}w{i}" for i in range(40))
    for i in range(1500):
        if i < 600:
            text = template
        else:
            text = " ".join(f"u{i}x{j} uniq{(i * 31 + j) % 9973}" for j in range(30))
        rows.append((i, text, f"src{i % 3}"))
    spark.createDataFrame(rows, "doc_id long, text string, source string").coalesce(
        2
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_minhash_band_cap_bounds_candidates(spark, boilerplate_corpus):
    """With the cap, the 600-identical-doc bucket must produce STAR pairs
    (599, all anchored at the min doc_id) instead of the 179,700-pair
    clique — linear, not quadratic, in bucket size."""
    from gluettalax_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, boilerplate_corpus).collect()
    dup_pairs = [r for r in pairs if r.doc_a < 600 and r.doc_b < 600]
    # Star shape: every in-cluster pair anchors at doc 0, jaccard 1.0.
    assert len(dup_pairs) == 599
    assert all(r.doc_a == 0 and r.jaccard == 1.0 for r in dup_pairs)
    # Nothing leaks across cluster/unique boundary at jaccard >= threshold.
    assert all(r.doc_a >= 600 or r.doc_b < 600 for r in pairs)


def test_minhash_band_cap_disabled_restores_clique(spark, boilerplate_corpus):
    """Sanity check on the mechanism: a cap above the bucket size yields
    the quadratic clique — proving the bounded result above comes from the
    cap, not from the corpus."""
    from gluettalax_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, boilerplate_corpus, max_bucket=10_000)
    n_dup = pairs.filter("doc_a < 600 AND doc_b < 600").count()
    assert n_dup == 600 * 599 // 2


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_simhash_band_cap_bounds_candidates(spark, boilerplate_corpus):
    from gluettalax_spark.operators.dedup import dedup_simhash_pairs

    pairs = dedup_simhash_pairs(spark, boilerplate_corpus)
    dup = pairs.filter("doc_a < 600 AND doc_b < 600").collect()
    # Identical docs -> identical fingerprints -> hamming 0 star pairs.
    assert len(dup) == 599
    assert all(r.doc_a == 0 and r.hamming == 0 for r in dup)


def test_band_spill_report_surfaces_degraded_buckets(spark, boilerplate_corpus, sf_dir):
    """The spill report shows the degraded buckets (identical docs share
    all 4 band values -> 4 over-cap buckets of 600) on the adversarial
    corpus, and is EMPTY on the healthy fixture — the alertable metric."""
    from gluettalax_spark.operators.dedup import dedup_band_spill_report

    spill = dedup_band_spill_report(spark, boilerplate_corpus).collect()
    assert [int(r.bucket_n) for r in spill] == [600, 600, 600, 600]
    assert sorted(int(r.band_idx) for r in spill) == [0, 1, 2, 3]
    assert dedup_band_spill_report(spark, sf_dir).count() == 0


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_band_cap_unchanged_on_fixture(spark, sf_dir):
    """On the normal fixture no bucket reaches the cap, so capped and
    uncapped runs are row-identical — the oracle contract is untouched."""
    from gluettalax_spark.operators.dedup import dedup_minhash_lsh

    capped = dedup_minhash_lsh(spark, sf_dir)
    uncapped = dedup_minhash_lsh(spark, sf_dir, max_bucket=1 << 40)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_ngram_jaccard_block_cap_bounds_candidates(spark, boilerplate_corpus):
    """The 3-minhash block key sends all 600 identical docs to ONE block;
    with the cap that block yields 599 star pairs, not a 179,700 clique."""
    from gluettalax_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, boilerplate_corpus)
    dup = pairs.filter("doc_a < 600 AND doc_b < 600").collect()
    assert len(dup) == 599
    assert all(r.doc_a == 0 and r.jaccard == 1.0 for r in dup)


def test_ngram_jaccard_cap_unchanged_on_fixture(spark, sf_dir):
    from gluettalax_spark.operators.dedup import dedup_ngram_jaccard

    capped = dedup_ngram_jaccard(spark, sf_dir)
    uncapped = dedup_ngram_jaccard(spark, sf_dir, max_bucket=1 << 40)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_embedding_neardup_bucket_cap(spark, tmp_path):
    """Mass-duplicated embeddings (one vector repeated 700x) land in one
    sign-LSH bucket; the cap degrades it to 699 star pairs (cosine 1.0)
    instead of a 244,650-pair clique, and unique vectors are unaffected."""
    import numpy as np

    from gluettalax_spark.operators.similarity import embedding_neardup

    rng = np.random.default_rng(42)
    dup = rng.normal(size=64).tolist()
    rows = [(i, dup if i < 700 else rng.normal(size=64).tolist(), "en")
            for i in range(900)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).coalesce(2).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    pairs = embedding_neardup(spark, str(tmp_path))
    dup_pairs = pairs.filter("vec_a < 700 AND vec_b < 700").collect()
    assert len(dup_pairs) == 699
    assert all(r.vec_a == 0 and r.cosine == 1.0 for r in dup_pairs)


@pytest.mark.slow  # gate tier (make gate): heavyweight recompute/replay (r13 tiering)
def test_embedding_neardup_cap_unchanged_on_fixture(spark, sf_dir):
    from gluettalax_spark.operators.similarity import embedding_neardup

    capped = embedding_neardup(spark, sf_dir)
    uncapped = embedding_neardup(spark, sf_dir, max_bucket=1 << 40)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_fuzzy_pairs_block_cap(spark, boilerplate_corpus, sf_dir):
    """The fuzzy join's (lang, size_block) key has FIXED cardinality, so
    the 600-identical-doc corpus collapses into one block; the cap yields
    599 star pairs (edit_dist 0) instead of the clique. Fixture parity:
    capped == uncapped."""
    from gluettalax_spark.operators.text import text_fuzzy_prefix_pairs

    import pyspark.sql.functions as F
    from gluettalax_spark.tables import load

    # boilerplate_corpus lacks lang/n_chars; derive them like a crawler would.
    docs = spark.read.parquet(f"{boilerplate_corpus}/documents.parquet").select(
        "doc_id", "text", "source",
        F.lit("en").alias("lang"), F.length("text").alias("n_chars"),
    )
    d2 = f"{boilerplate_corpus}/with_meta"
    docs.coalesce(2).write.mode("overwrite").parquet(f"{d2}/documents.parquet")

    pairs = text_fuzzy_prefix_pairs(spark, d2)
    dup = pairs.filter("doc_a < 600 AND doc_b < 600").collect()
    assert len(dup) == 599
    assert all(r.doc_a == 0 and r.edit_dist == 0 for r in dup)

    capped = text_fuzzy_prefix_pairs(spark, sf_dir)
    uncapped = text_fuzzy_prefix_pairs(spark, sf_dir, max_block=1 << 40)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_mega_basket_capped_in_cooccurrence_family(spark, tmp_path):
    """One 300-item order would contribute C(300,2) ≈ 45k pairs from a
    single row; the MAX_BASKET cap drops it whole while normal baskets
    still mine. The oracles replay the cap, so this is spec, not a
    silent divergence."""
    from gluettalax_spark.registry import queries

    rows = []
    # Degenerate order 99: 300 distinct parts.
    rows += [(99, 1000 + i, i + 1, 1.0) for i in range(300)]
    # Two normal co-orders making {1, 2} a support-2 pair.
    rows += [(1, 1, 1, 1.0), (1, 2, 2, 1.0), (2, 1, 1, 1.0), (2, 2, 2, 1.0)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber long, l_extendedprice double"
    )
    out = str(tmp_path / "li")
    df.write.parquet(f"{out}/lineitem.parquet")

    pairs = {(r.part_a, r.part_b): r.n_orders for r in queries()["part_cooccurrence"](spark, out).collect()}
    # The mega-basket's 45k pairs are absent; the legit pair survives.
    assert pairs == {(1, 2): 2}

    tri = queries()["graph_triangle_count"](spark, out).collect()[0]
    assert tri.n_edges == 1 and tri.n_triangles == 0  # only the capped graph

    rules = queries()["basket_rules"](spark, out).collect()
    # Both directions of the 1↔2 rule, computed over the CAPPED universe
    # (N=2 baskets, the mega-basket excluded from counts too).
    assert {(r.part_a, r.part_b, r.n_ab, r.conf, r.lift) for r in rules} == {
        (1, 2, 2, 1.0, 1.0),
        (2, 1, 2, 1.0, 1.0),
    }
