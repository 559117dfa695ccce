"""Iterative graph operators — near-dup pairs → duplicate CLUSTERS.

A dedup pipeline doesn't stop at pairs: (a,b) and (b,c) must collapse into
one group with one canonical keeper. That's connected components over the
similarity graph — the canonical iterative-algorithm workload a training-
data pipeline runs after MinHash/SimHash candidate generation.

The reference has no graph code (its only iteration is service polling,
``gluettalax.py:220-224``); this is part of the LLM-pipeline extension
surface (BASELINE.json north star).

Scale design: label propagation by repeated min-join. Each round is one
shuffled join + aggregate; rounds needed = graph diameter (near-dup
clusters are shallow — a handful). Lineage is cut per round with
``localCheckpoint`` (cluster analog: checkpoint to storage) so the plan
doesn't grow with iterations. At extreme scale, swap the loop body for the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same join primitive, provably fewer rounds.
"""

from __future__ import annotations

import os

from gluettalax_spark.memory import CKPT_LEVEL

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gluettalax_spark.operators.dedup import _NGRAM_ORACLE, dedup_ngram_jaccard
from gluettalax_spark.registry import register
from gluettalax_spark.tables import load

_MAX_ROUNDS = 25

# Min-label rounds before falling over to the large-star/small-star
# variant. Near-dup clusters are shallow (diameter ≲ 3), so the common
# case converges here at one join+agg per round; a chained graph (a
# template-spam corpus produces paths, diameter ~ corpus size) would need
# DIAMETER rounds, so past this budget the remaining work is contracted
# and finished in O(log² n) star rounds instead of being truncated.
_FALLOVER_ROUNDS = 5


class _GenerationRotator:
    """Release the storage blocks of SUPERSEDED localCheckpoint generations.

    An iterative loop that eagerly localCheckpoints every round keeps the
    blocks of EVERY past round alive until the py4j refs are GC'd —
    Spark's ContextCleaner lags a tight sequential loop badly enough that
    at sf10 the dead generations starve hash-aggregate execution memory
    (the r12 sweep's UNABLE_TO_ACQUIRE_MEMORY at the default 8g heap).
    The rotator reads the checkpoint RDD's id straight off the returned
    frame's ``LogicalRDD`` and, once the new generation is materialized
    AND the loop no longer references the old one, unpersists exactly the
    old generation's blocks. (It previously DIFFED the whole
    persistent-RDD id set around the call — but a lazy checkpoint
    executes upstream stages at call time, so any not-yet-materialized
    upstream ``persist`` — CC's ``sym``, a caller's ``_minhash_sigs`` —
    first registered inside that window, was misattributed to the new
    generation, and round-1 ``retire()`` silently dropped the
    multi-consumer cache; ADVICE r12.) Unpersisting a locally-
    checkpointed RDD makes it unrecomputable — callers must only
    ``retire()`` after the last read. Cluster analog: deleting the
    previous round's checkpoint files.

    Why localCheckpoint and not persist (r12 post-mortem): a persist cut
    does NOT truncate the LOGICAL plan — CacheManager substitution only
    happens at execution planning — and these loops reference the previous
    generation 2-4x per round (join + keep-set / star pairs), so the
    logical tree grows exponentially round-over-round and the DRIVER dies
    analyzing it (observed: graph_kcore heap OOM at 3^rounds). Truncating
    lineage per generation is load-bearing here; the AQE stage execution
    a lazy checkpoint runs at call time is the price."""

    def __init__(self, spark: SparkSession) -> None:
        self._jsc = spark.sparkContext._jsc
        self._live: set[int] = set()

    def checkpoint(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """``eager=False`` is safe ONLY when the caller runs an action on
        the returned frame before ``retire()`` — the lazy checkpoint
        registers its blocks immediately (persist-at-mark), but the OLD
        generation must stay readable until the new one has materialized.
        Loops whose convergence probe already consumes the new frame get
        the final-stage materialization fused with the probe (under AQE
        the upstream stages still execute at call time)."""
        out = df.localCheckpoint(eager=eager, storageLevel=CKPT_LEVEL)
        # Track ONLY the checkpoint RDD this call created: the analyzed
        # plan of a checkpointed frame is a LogicalRDD over exactly the
        # persisted RDD. A snapshot diff would also catch unrelated RDDs
        # registered while the lazy checkpoint ran upstream stages.
        self._pending = {out._jdf.queryExecution().analyzed().rdd().id()}
        return out

    def retire(self) -> None:
        """Unpersist the PREVIOUS generation; promote the pending one."""
        rdds = self._jsc.getPersistentRDDs()
        for rid in self._live:
            jrdd = rdds.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        self._live = getattr(self, "_pending", set())
        self._pending = set()


def connected_components(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Pure DataFrame iteration — no RDDs, no collect of data
    (only a 1-row convergence count per round crosses to the driver).

    Hybrid: min-label propagation (cheapest per round, diameter-bounded
    rounds) with a round-count guard — if the graph hasn't converged in
    ``_FALLOVER_ROUNDS`` it is DEEP, so the partially-collapsed graph is
    contracted to label space (every label = one supernode; edges between
    equal labels drop) and handed to :func:`connected_components_star`,
    whose round count is O(log² n) regardless of diameter. Same fixpoint
    either way (component = min reachable id); the fallover only changes
    which join schedule reaches it."""
    sym = edges.selectExpr(f"{src} AS u", f"{dst} AS v").unionByName(
        edges.selectExpr(f"{dst} AS u", f"{src} AS v")
    )
    # Static across rounds; lazy persist (r12) — the first round's
    # convergence probe materializes it, no separate build-time job.
    sym = sym.distinct().persist(CKPT_LEVEL)
    rot = _GenerationRotator(edges.sparkSession)
    # eager=False throughout (optimization r12, the kcore §5 fusion): every
    # round's `changed` count consumes the new generation BEFORE retire(),
    # so the checkpoint materializes inside the probe — one driver-blocking
    # job per round instead of two.
    labels = rot.checkpoint(
        sym.select(F.col("u").alias("node")).distinct().withColumn("lab", F.col("node")),
        eager=False,
    )
    rot.retire()
    converged = False
    # Convergence probe by LABEL-SUM (r13, guide §2.1): min-label rounds
    # only ever DECREASE a node's label (lab' = least(lab, nbr_min)), so
    # Σlab is strictly monotone while anything changes and
    # "changed == 0" ⟺ "Σlab unchanged". The old probe joined the new
    # generation against the old one per round; this is one aggregate
    # over the new generation alone — the same single job that
    # materializes the lazy checkpoint, one join fewer per round.
    # decimal(38,0) keeps the sum exact at any node-id scale. Only valid
    # for NUMERIC labels (ids); string node keys (the fuzzy-name graph)
    # keep the join-probe — min() still decreases lexicographically but
    # has no exact sum.
    from pyspark.sql.types import ByteType, DecimalType, IntegerType, LongType, ShortType

    sum_probe = isinstance(
        labels.schema["lab"].dataType,
        (ByteType, ShortType, IntegerType, LongType, DecimalType),
    )
    prev_sum = None
    for _ in range(_FALLOVER_ROUNDS):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = rot.checkpoint(
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))).alias("lab"),
            ),
            eager=False,
        )
        if sum_probe:
            cur_sum = new_labels.agg(
                F.sum(F.col("lab").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            done = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            done = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .count()
                == 0
            )
        # The probe was the superseded generation's last read — release
        # its blocks now (the rotator, not ContextCleaner lag, decides).
        rot.retire()
        labels = new_labels
        if done:
            converged = True
            break
    if converged:
        return labels.select(F.col("node"), F.col("lab").alias("component"))
    # Deep graph: contract to label space and finish with star rounds.
    # Each partially-collapsed cluster is one supernode, so the contracted
    # edge set is no larger than the input and usually far smaller.
    contracted = (
        sym.join(labels.selectExpr("node AS u", "lab AS lu"), "u")
        .join(labels.selectExpr("node AS v", "lab AS lv"), "v")
        .filter(F.col("lu") != F.col("lv"))
        .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
        .distinct()
    )
    star = connected_components_star(contracted).selectExpr(
        "node AS lab", "component AS comp"
    )
    return labels.join(star, "lab", "left").select(
        "node", F.coalesce(F.col("comp"), F.col("lab")).alias("component")
    )


# Shared recursive-CTE prefix: near-dup pairs → transitive closure → per-doc
# min-reachable component. Used by dedup_clusters and dedup_filter_corpus.
_CC_COMP_CTES = f"""
WITH RECURSIVE {_NGRAM_ORACLE.strip().split("WITH", 1)[1].rsplit("SELECT doc_a", 1)[0].rstrip().rstrip(")").rstrip()}
),
pairs AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
verts AS (SELECT DISTINCT u AS doc FROM edges),
reach(doc, lab) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
),
comp AS (
  SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component
  FROM reach GROUP BY doc
)
"""

_CC_ORACLE = f"""
{_CC_COMP_CTES}
SELECT
  c.doc_id,
  c.component,
  s.cluster_size,
  CASE WHEN c.doc_id = c.component THEN TRUE ELSE FALSE END AS is_keeper
FROM comp c
JOIN (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component) s
  USING (component)
ORDER BY c.component, c.doc_id
"""


@register(
    "dedup_clusters",
    _CC_ORACLE,
    doc="connected components over near-dup pairs → cluster id + keeper flag",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (blocked n-gram Jaccard ≥ 0.3) → connected
    components via iterative min-label propagation. The oracle replays the
    exact semantics with a recursive CTE (transitive closure + min) —
    different algorithm, identical fixpoint, which is the point: the
    result is algorithm-independent."""
    from pyspark.sql.window import Window

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    # cluster_size via a window, NOT an aggregate broadcast back — the
    # per-component table grows with the data (same unbounded-broadcast
    # class as the round-1 cohort bug); one hash-partition on component
    # covers both the count and the keeper flag.
    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (F.col("doc_id") == F.col("component")).alias("is_keeper"),
        )
        .orderBy("component", "doc_id")
    )


_FILTER_CORPUS_ORACLE = f"""
{_CC_COMP_CTES}
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
LEFT JOIN (SELECT doc_id FROM comp WHERE doc_id <> component) dup
  ON d.doc_id = dup.doc_id
WHERE dup.doc_id IS NULL
ORDER BY d.doc_id
"""


@register(
    "dedup_filter_corpus",
    _FILTER_CORPUS_ORACLE,
    doc="end-to-end dedup: corpus minus non-keeper near-dup cluster members",
)
def dedup_filter_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The op a training pipeline actually runs: pairs → components →
    drop every cluster member except the keeper (min doc_id), keeping the
    surviving corpus. The anti-join ships only loser doc_ids — never
    text; Spark picks broadcast vs shuffle by the loser count (a heavily
    duplicated corpus can have many losers, so no forced broadcast)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = load(spark, sf_dir, "documents")
    return (
        docs.join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Large-star / small-star connected components (Kiveris et al., the
# provably-few-rounds variant promised in SCALING.md)
# --------------------------------------------------------------------------


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node points its LARGER neighbors at the
    minimum of its neighborhood (incl. itself)."""
    sym = edges.unionByName(edges.selectExpr("v AS u", "u AS v")).distinct()
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select("u", F.least(F.col("nbr_min"), F.col("u")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient each edge large→small, then every node
    rewires its smaller neighbors (and itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(m, "u")
    rewired = nbrs.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = m.select("u", F.col("m").alias("v"))
    return rewired.unionByName(self_edges).distinct()


def connected_components_star(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, component) via alternating large-star/small-star rounds —
    O(log² n) rounds with bounded per-node fanout, versus graph-DIAMETER
    rounds for plain min-label propagation (`connected_components`). Same
    fixpoint; tests assert equivalence. Use this variant for deep/chained
    graphs; the min-label one for shallow near-dup clusters."""
    rot = _GenerationRotator(edges.sparkSession)
    # eager=False (r12, the kcore §5 fusion): the isEmpty probe / per-round
    # convergence compare consume each generation before retire(), so the
    # checkpoint materializes inside the probe job it already pays for.
    e = rot.checkpoint(
        edges.selectExpr(f"{src} AS u", f"{dst} AS v")
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        eager=False,
    )
    rot.retire()
    singletons = edges.selectExpr(f"{src} AS n").unionByName(
        edges.selectExpr(f"{dst} AS n")
    ).distinct()
    if e.rdd.isEmpty():
        return singletons.select(F.col("n").alias("node"), F.col("n").alias("component"))
    for _ in range(_MAX_ROUNDS):
        e2 = rot.checkpoint(_small_star(_large_star(e)), eager=False)
        # Converged when the edge set is unchanged (both are distinct sets).
        same = e2.count() == e.count() and e2.exceptAll(e).rdd.isEmpty()
        # The convergence compare was the old generation's last read.
        rot.retire()
        e = e2
        if same:
            break
    # After convergence every edge points node → its component root.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    covered = labels.unionByName(roots)
    isolated = singletons.join(
        covered.select(F.col("node").alias("n")).distinct(), "n", "left_anti"
    ).select(F.col("n").alias("node"), F.col("n").alias("component"))
    return covered.unionByName(isolated).distinct()


# --------------------------------------------------------------------------
# Clusters over MinHash+LSH pairs (the production dedup chain)
# --------------------------------------------------------------------------

def _minhash_cc_oracle() -> str:
    from gluettalax_spark.operators.dedup import _minhash_oracle

    mh = _minhash_oracle().strip().removesuffix("ORDER BY doc_a, doc_b").rstrip()
    return f"""
WITH RECURSIVE mh AS (
{mh}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mh
  UNION
  SELECT doc_b AS u, doc_a AS v FROM mh
),
verts AS (SELECT DISTINCT u AS doc FROM edges),
reach(doc, lab) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON e.v = r.doc
),
comp AS (
  SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component
  FROM reach GROUP BY doc
)
SELECT
  doc_id,
  component,
  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
  doc_id = component AS is_keeper
FROM comp
ORDER BY component, doc_id
"""


@register(
    "dedup_minhash_clusters",
    _minhash_cc_oracle(),
    doc="connected components over MinHash+LSH pairs (the production dedup chain)",
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain a 100 TB corpus dedup actually runs: MinHash signatures →
    LSH band candidates → Jaccard-verified pairs → connected components →
    keeper per cluster. Same label-propagation core as dedup_clusters;
    cluster_size via a window (never a per-component broadcast)."""
    from pyspark.sql.window import Window

    from gluettalax_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (F.col("doc_id") == F.col("component")).alias("is_keeper"),
        )
        .orderBy("component", "doc_id")
    )


# --------------------------------------------------------------------------
# Triangle counting (degree-oriented wedge join)
# --------------------------------------------------------------------------

_TRI_MIN_SUPPORT = 2

# Basket-size cap for every pair-explode over per-order baskets: one
# degenerate mega-basket (a bulk order, a crawler artifact) yields
# C(n,2) pairs from a single row — quadratic work the data model never
# promised. Production market-basket pipelines drop oversized baskets
# (they carry no signal: co-occurrence in a 10k-item order is noise);
# the cap is REPLAYED in every DuckDB oracle, so it is part of the
# operator spec, not a silent divergence (the round-5 lesson). The
# fixture's widest basket is ~7, so fixture outputs are unchanged.
MAX_BASKET = 256

# Oracle fragment: orders whose DISTINCT part count is within the cap.
_DUCK_CAPPED_OP = f"""(
  SELECT o, p FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
  WHERE o IN (
    SELECT l_orderkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    GROUP BY l_orderkey HAVING count(*) <= {MAX_BASKET}
  )
)"""


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pa, pb), pa < pb — the part co-occurrence graph: parts co-ordered
    in >= ``_TRI_MIN_SUPPORT`` distinct orders (the min-support prune
    that keeps a basket graph sparse); baskets wider than ``MAX_BASKET``
    distinct parts are dropped whole (see the cap comment above).

    Per-order pair generation WITHOUT a self-join: one groupBy(order)
    collects the (deduped, sorted) basket — bounded by items-per-order,
    a data-model constant — and the ordered pairs explode map-side from
    the array. One shuffle replaces distinct + self-join (two)."""
    li = load(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= MAX_BASKET)
    )
    return (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("e")
        )
        .select("e.pa", "e.pb")
        .groupBy("pa", "pb")
        .count()
        .where(F.col("count") >= _TRI_MIN_SUPPORT)
        .select("pa", "pb")
    )


_TRIANGLE_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e
  ) GROUP BY n
)
SELECT
  CAST((SELECT count(*) FROM deg) AS BIGINT)                    AS n_nodes,
  CAST((SELECT count(*) FROM e) AS BIGINT)                      AS n_edges,
  CAST((SELECT max(d) FROM deg) AS BIGINT)                      AS max_degree,
  CAST((SELECT count(*)
        FROM e x JOIN e y ON y.pa = x.pb
               JOIN e z ON z.pa = x.pa AND z.pb = y.pb) AS BIGINT) AS n_triangles
"""


@register(
    "graph_triangle_count",
    _TRIANGLE_ORACLE,
    doc="triangle count on the part co-occurrence graph (degree-oriented wedge join)",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting over the part co-occurrence graph (parts
    co-ordered in >= 2 distinct orders — the min-support prune that keeps
    a basket graph sparse), via the MapReduce-classic degree orientation
    (Suri & Vassilvitskii, WWW'11): each undirected edge is directed from
    its (degree, id)-smaller endpoint, so every vertex's out-degree is
    O(sqrt(m)) and every triangle is counted exactly once — as the wedge
    at its (degree, id)-minimum vertex closed by the oriented edge
    between the two out-neighbors.

    Scale shape: pair generation is an equi-self-join on l_orderkey
    (fan-out bounded by items-per-order, a data-model constant — never
    all-pairs over parts); support>=2 prunes the edge set; the wedge
    self-join is keyed on the oriented source whose fan-out the
    orientation bounds by sqrt(2m); the close check is an equi-semi-join
    on the (a, b) pair. The ORACLE counts the same triangles via the
    orientation-invariant id-ordered 3-way join, so the compare also
    proves the orientation math. Everything is integer-exact."""
    # Cut lineage: the edge set feeds four consumers (deg, orientation,
    # wedge join, close join) — recomputing the basket explode per
    # consumer would dominate the runtime.
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)

    deg = (
        edges.select(F.col("pa").alias("n"))
        .unionAll(edges.select(F.col("pb").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Orient each edge from its (degree, id)-smaller endpoint.
    ed = (
        edges.join(deg.withColumnRenamed("n", "pa").withColumnRenamed("d", "da"), "pa")
        .join(deg.withColumnRenamed("n", "pb").withColumnRenamed("d", "db"), "pb")
        .select(
            F.when((F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))), F.col("pa"))
            .otherwise(F.col("pb")).alias("src"),
            F.when((F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))), F.col("pb"))
            .otherwise(F.col("pa")).alias("dst"),
            F.greatest("da", "db").alias("deg_dst_hi"),
            F.least("da", "db").alias("deg_src"),
        )
        .select("src", "dst", F.col("deg_dst_hi").alias("deg_dst"))
    )
    ed = ed.persist(CKPT_LEVEL)

    # Wedges at the orientation-minimum vertex: two out-neighbors of the
    # same src, ordered by (degree, id) so the closing edge is oriented.
    w1, w2 = ed.alias("w1"), ed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (
            (F.col("w1.deg_dst") < F.col("w2.deg_dst"))
            | ((F.col("w1.deg_dst") == F.col("w2.deg_dst")) & (F.col("w1.dst") < F.col("w2.dst")))
        ),
    ).select(F.col("w1.dst").alias("ta"), F.col("w2.dst").alias("tb"))
    closed = wedges.join(
        ed.select(F.col("src").alias("ta"), F.col("dst").alias("tb")), ["ta", "tb"], "leftsemi"
    )

    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
    ).crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
    # Both sides of each crossJoin are single-row aggregates.
    return stats.crossJoin(n_tri).select("n_nodes", "n_edges", "max_degree", "n_triangles")


# --------------------------------------------------------------------------
# PageRank (iterative; the genuinely non-SQL-expressible graph op)
# --------------------------------------------------------------------------

_PR_ITERS = 8
# Rounds per lineage cut (round fusion, r13): each pagerank round
# references its predecessor once, so the plan grows linearly between
# cuts; env-overridable ONLY for the A/B harness.
_PR_CKPT_EVERY = int(os.environ.get("SPARK_GRAFT_PR_CKPT_EVERY", "4"))
_PR_TOPK = 20
# Fixed-point arithmetic for the rank vector: ranks live in integer
# units of 1e-12 ("e12"), damping 0.85 is the exact rational 85/100, and
# every division is an integer DIV — so all 8 rounds are EXACT integer
# recurrences both engines replay bit-identically, the same unrolled-
# integer-rounds trick that made HITS and k-core oracle-checkable
# (VERDICT r10 "what's missing" #2: float PageRank was the last
# fixed-point op still on a rows-only contract).
_PR_SCALE = 1_000_000_000_000  # 1e12: r0 = SCALE // n
_PR_TELEPORT_E12 = 150_000_000_000  # 0.15 * SCALE: base = this // n


def _pagerank_round_sql(i: int) -> str:
    """One unrolled PageRank round as a DuckDB CTE: the SAME integer
    recurrence the Spark loop computes —
    r_{i}(v) = base + (85 * Σ_{u→v} (r_{i-1}(u) // d_u)) // 100."""
    return f"""r{i} AS MATERIALIZED (
  SELECT adj.dst AS n,
         CAST(nn.base + (85 * sum(r{i - 1}.r // adj.d_src)) // 100 AS BIGINT) AS r
  FROM adj JOIN r{i - 1} ON r{i - 1}.n = adj.src, nn
  GROUP BY adj.dst, nn.base
)"""


_PR_ROUNDS_SQL = ",\n".join(_pagerank_round_sql(i) for i in range(1, _PR_ITERS + 1))

_PAGERANK_ORACLE = f"""
WITH op AS MATERIALIZED (SELECT o, p FROM {_DUCK_CAPPED_OP}),
e AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUPPORT}
),
sym AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb AS src, pa AS dst FROM e
),
deg AS MATERIALIZED (SELECT src AS n, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src),
adj AS MATERIALIZED (
  SELECT sym.src, sym.dst, deg.d AS d_src FROM sym JOIN deg ON deg.n = sym.src
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST({_PR_TELEPORT_E12} // count(*) AS BIGINT) AS base
  FROM deg
),
r0 AS MATERIALIZED (
  SELECT deg.n, CAST({_PR_SCALE} // nn.n AS BIGINT) AS r FROM deg, nn
),
{_PR_ROUNDS_SQL},
mass AS (SELECT CAST(sum(r) AS BIGINT) AS mass_e12 FROM r{_PR_ITERS})
SELECT r{_PR_ITERS}.n AS part, r{_PR_ITERS}.r AS rank_e12, deg.d AS degree, mass.mass_e12
FROM r{_PR_ITERS} JOIN deg ON deg.n = r{_PR_ITERS}.n, mass
ORDER BY rank_e12 DESC, part
LIMIT {_PR_TOPK}
"""


@register(
    "graph_pagerank",
    _PAGERANK_ORACLE,
    doc=f"PageRank ({_PR_ITERS} unrolled integer-quantized rounds, d=85/100) on the "
    f"part co-occurrence graph, top-{_PR_TOPK} (oracle-exact: fixed-point e12 "
    "arithmetic, every round an integer recurrence both engines replay)",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration PageRank over the undirected part co-occurrence
    graph (every edge contributes both directions, so out-degree =
    degree and there are no dangling nodes by construction — every node
    has degree >= 1).

    Exactness: ranks are int64 fixed-point at 1e-12 — r0 = SCALE DIV n,
    each round r' = (0.15·SCALE DIV n) + (85 · Σ floor(r/d)) DIV 100 —
    so the whole 8-round trajectory is exact integer arithmetic, and the
    DuckDB oracle unrolls the identical recurrence as 8 MATERIALIZED
    CTEs (the `graph_hits_bipartite`/`graph_kcore` discipline). The
    whole-graph mass total rides along as an exact integer column:
    floor losses keep it slightly under SCALE, identically on both
    engines.

    Scale shape: the adjacency is built once (basket explode + support
    prune), symmetrized map-side, pre-joined with the degree table, and
    FROZEN with localCheckpoint — each of the 8 iterations is then
    exactly one equi-join (adjacency x ranks, both hash-partitioned on
    the node key) plus one aggregation; ranks are checkpointed every
    `_PR_CKPT_EVERY` iterations (round fusion, r13 — one rank-join per
    round keeps the un-cut plan linear, so a handful of rounds share a
    cut and the per-round driver-blocking checkpoint barriers drop with
    it; unbounded unrolling is still avoided — lineage blow-up is the
    classic iterative-DataFrame failure mode). On a real cluster the
    adjacency would be a bucketed table so
    the per-iteration join co-locates without reshuffling the static
    side; the rank side is (node, long) — the narrowest possible
    shuffle.
    """
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)

    sym = edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("n")).agg(F.count(F.lit(1)).alias("d"))
    # Static per-iteration input: (src, dst, d_src), frozen once.
    adj = (
        sym.join(deg.withColumnRenamed("n", "src"), "src")
        .select("src", "dst", F.col("d").alias("d_src"))
        .persist(CKPT_LEVEL)
    )

    n_nodes = deg.count()
    if n_nodes == 0:
        # Support-pruned graph can be empty; an empty result beats a
        # divide-by-zero in the teleport term.
        return spark.createDataFrame([], "part long, rank_e12 long, degree long, mass_e12 long")
    base = _PR_TELEPORT_E12 // n_nodes
    ranks = deg.select("n", F.lit(_PR_SCALE // n_nodes).cast("long").alias("r"))
    for it in range(1, _PR_ITERS + 1):
        contribs = (
            adj.join(ranks.withColumnRenamed("n", "src"), "src")
            .groupBy(F.col("dst").alias("n"))
            .agg(F.sum(F.expr("r DIV d_src")).alias("in_sum"))
        )
        ranks = contribs.select(
            "n",
            (F.lit(base) + F.expr("(85 * in_sum) DIV 100")).cast("long").alias("r"),
        )
        # Round FUSION (r13, VERDICT r12 #7): each round references its
        # predecessor exactly ONCE (join + aggregate), so the un-cut
        # logical plan grows LINEARLY and several rounds can ride one
        # lineage cut — under AQE every lazy localCheckpoint call
        # executes all upstream stages as driver-blocking work, so
        # fusing rounds removes (ITERS − ITERS/K) of those barriers and
        # block materializations while executing the same shuffles.
        # Cut cadence measured in the r13 A/B (see OPTIMIZATION_r13.md);
        # the final round is ALWAYS cut: mass + the deg join both
        # consume `ranks`, and without the cut the whole chain would
        # execute twice. Lazy localCheckpoint, NOT persist — the r12
        # A/B measured the 8-deep InMemoryRelation chain 3x slower
        # (7.7 s vs 2.5 s builder+count).
        if it % _PR_CKPT_EVERY == 0 or it == _PR_ITERS:
            ranks = ranks.localCheckpoint(eager=False, storageLevel=CKPT_LEVEL)

    mass = ranks.agg(F.sum("r").cast("long").alias("mass_e12"))
    return (
        ranks.join(deg, "n")
        .select(
            F.col("n").alias("part"),
            F.col("r").alias("rank_e12"),
            F.col("d").cast("long").alias("degree"),
        )
        .orderBy(F.desc("rank_e12"), F.asc("part"))
        .limit(_PR_TOPK)
        .crossJoin(F.broadcast(mass))
        .orderBy(F.desc("rank_e12"), F.asc("part"))
    )


# --------------------------------------------------------------------------
# Label propagation communities (fixed synchronous iterations, oracle-exact)
# --------------------------------------------------------------------------

_LPA_ITERS = 3
_LPA_TOPK = 20


def _lpa_cte_prefix() -> str:
    """Unrolled DuckDB replay of the synchronous label-propagation rounds:
    each iteration is the SAME join + count + (count desc, label asc)
    argmax the Spark side computes — deterministic integer math, so the
    compare is hash-exact. Returns the WITH-chain ending at the final
    ``lab{_LPA_ITERS}`` CTE plus ``edges``/``e0`` for reuse; callers
    append their own final SELECT (community sizes, modularity, ...)."""
    parts = [
        f"""WITH op AS MATERIALIZED (SELECT o, p FROM {_DUCK_CAPPED_OP}),
e0 AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUPPORT}
),
edges AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e0 UNION ALL SELECT pb AS u, pa AS v FROM e0),
lab0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM edges)"""
    ]
    cur = "lab0"
    for i in range(1, _LPA_ITERS + 1):
        parts.append(
            f""",
agg{i} AS MATERIALIZED (
  SELECT e.u AS node, l.lab, count(*) AS c
  FROM edges e JOIN {cur} l ON l.node = e.v GROUP BY 1, 2
),
lab{i} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM agg{i}
  ) WHERE rn = 1
)"""
        )
        cur = f"lab{i}"
    return "".join(parts)


def _lpa_oracle() -> str:
    return (
        _lpa_cte_prefix()
        + f"""
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members
FROM lab{_LPA_ITERS} GROUP BY lab ORDER BY n_members DESC, community LIMIT {_LPA_TOPK}"""
    )


def _lpa_edges_and_labels(spark: SparkSession, sf_dir: str):
    """(undirected edges, final LPA labels) — the per-round join + count
    + min(struct) argmax shape documented on :func:`graph_communities_lpa`;
    shared with :func:`graph_modularity` so both score the same labeling."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    sym = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(_LPA_ITERS):
        nbr = sym.join(labels.withColumnRenamed("node", "v"), "v").select(
            F.col("u").alias("node"), "lab"
        )
        cnt = nbr.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("lab").alias("l"))
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("lab"))
            # persist, not localCheckpoint (r12): AQE executes upstream
            # stages at even a lazy checkpoint call — 3 blocking builder
            # jobs; the CacheManager substitution keeps plans one round
            # deep with zero build-time execution (see graph_pagerank).
            .persist(CKPT_LEVEL)
        )
    return edges, labels


@register(
    "graph_communities_lpa",
    _lpa_oracle(),
    doc=f"label-propagation communities ({_LPA_ITERS} synchronous rounds), top-{_LPA_TOPK} by size",
)
def graph_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation on the part
    co-occurrence graph: every node starts as its own label; each round
    it adopts the most frequent label among its NEIGHBORS, ties broken by
    the smaller label — a fully deterministic spec, so unlike classic
    randomized LPA the result is reproducible and the DuckDB oracle
    replays all 3 rounds unrolled (fixed iteration count is what keeps
    this SQL-expressible — contrast `graph_pagerank`, whose fixpoint is
    rows-only).

    Scale shape: per round ONE equi-join (edges x labels, both keyed on
    the node id) + one (node, label) count + an argmax folded into a
    single min(struct(-count, label)) aggregate — no windows, so the
    shuffle carries (node, label, count) rows only; labels are
    checkpointed per round to keep the plan one round deep. Same
    per-iteration shape a 100 TB run needs (bucketed edges co-locate the
    static side).
    """
    _, labels = _lpa_edges_and_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(_LPA_TOPK)
    )


def _modularity_oracle() -> str:
    n = _LPA_ITERS
    return (
        _lpa_cte_prefix()
        + f""",
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
intra AS (
  SELECT CAST(count(*) AS BIGINT) AS a
  FROM e0 JOIN lab{n} la ON la.node = e0.pa JOIN lab{n} lb ON lb.node = e0.pb
  WHERE la.lab = lb.lab
),
dc AS (
  SELECT l.lab, CAST(sum(d.d) AS HUGEINT) AS dsum
  FROM deg d JOIN lab{n} l ON l.node = d.node GROUP BY l.lab
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
bs AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
              CAST(sum(dsum * dsum) AS HUGEINT) AS b FROM dc)
SELECT n_communities,
       m AS m_edges,
       a AS intra_edges,
       CAST(a AS DOUBLE) / m
         - CAST(b AS DOUBLE) / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
         AS modularity
FROM mm, intra, bs"""
    )


@register(
    "graph_modularity",
    _modularity_oracle(),
    doc=f"Newman modularity Q of the {_LPA_ITERS}-round LPA communities",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score of the LPA partition (Newman & Girvan 2004):
    ``Q = Σ_c [L_c/m − (d_c/2m)²] = A/m − B/4m²`` with ``A`` = intra-
    community edges and ``B = Σ_c d_c²`` — two integer moments (B in
    DECIMAL(38,0)), then ONE double expression, so the score is exact
    cross-engine. The curation use: decide whether a community structure
    (e.g. near-dup clusters, topical buckets) is real before sharding by
    it.

    Scale shape: label join is node-keyed on both endpoints (never a
    broadcast of the unbounded label table), degrees aggregate from the
    edge list, and the three 1-row aggregates meet in broadcast
    crossJoins — nothing after the joins exceeds one row per community."""
    edges, labels = _lpa_edges_and_labels(spark, sf_dir)
    la = labels.select(F.col("node").alias("pa"), F.col("lab").alias("lab_a"))
    lb = labels.select(F.col("node").alias("pb"), F.col("lab").alias("lab_b"))
    intra = (
        edges.join(la, "pa")
        .join(lb, "pb")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dc = deg.join(labels, "node").groupBy("lab").agg(F.sum("d").cast("decimal(38,0)").alias("dsum"))
    bs = dc.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum(F.col("dsum") * F.col("dsum")).alias("b"),
    )
    mm = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    return (
        bs.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(intra))
        .selectExpr(
            "n_communities",
            "m AS m_edges",
            "a AS intra_edges",
            """CAST(a AS DOUBLE) / m
               - CAST(b AS DOUBLE) / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
               AS modularity""",
        )
    )


# --------------------------------------------------------------------------
# Recursive CTE reachability (Spark 4 WITH RECURSIVE, oracle-exact)
# --------------------------------------------------------------------------

_REACH_DEPTH = 3
_REACH_TOPK = 20

# Shared recursion body; {edges} is the support-pruned oriented edge
# relation — on the Spark side a temp view over the CHECKPOINTED
# cooccurrence_edges (Spark's UnionLoop re-evaluates every CTE the
# recursive step references on each level, so an unmaterialized edge
# definition would re-run the basket join per level — measured 3×
# slower); in the DuckDB oracle the same edge set is inlined as CTEs.
# Spark 4 recursive CTEs support UNION ALL only, so the recursion
# enumerates depth-capped PATHS over the ORIENTED (pa < pb, hence
# acyclic) edge set and dedupes outside — the depth cap is what bounds
# the path fan-out, exactly how production bounds open-ended recursion.
_REACH_SQL = f"""
WITH RECURSIVE
reach(root, node, depth) AS (
  SELECT pa AS root, pb AS node, 1 AS depth FROM {{edges}}
  UNION ALL
  SELECT r.root, e.pb AS node, r.depth + 1 AS depth
  FROM reach r JOIN {{edges}} e ON e.pa = r.node
  WHERE r.depth < {_REACH_DEPTH}
)
SELECT root, CAST(count(DISTINCT node) AS BIGINT) AS n_reach
FROM reach
GROUP BY root
ORDER BY n_reach DESC, root
LIMIT {_REACH_TOPK}
"""

_REACH_ORACLE_EDGES = f"""(
  WITH base AS (SELECT o, p FROM {_DUCK_CAPPED_OP})
  SELECT a.p AS pa, b.p AS pb
  FROM base a JOIN base b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING count(*) >= {_TRI_MIN_SUPPORT}
)"""


@register(
    "sql_recursive_reach",
    _REACH_SQL.format(edges=_REACH_ORACLE_EDGES),
    doc=f"WITH RECURSIVE reachability (≤{_REACH_DEPTH} oriented hops) on the co-occurrence DAG, top-{_REACH_TOPK}",
)
def sql_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE, exercised end-to-end: parts reachable
    within ≤3 hops along the ORIENTED co-occurrence edge set (pa < pb
    makes the graph a DAG, so UNION ALL recursion terminates), top-20
    roots by distinct reach. The SAME SQL text runs on both engines —
    Spark executes the recursion in Catalyst (UnionLoop), DuckDB replays
    it with its own recursive CTE machinery, and the result is
    deterministic integer math, so the compare is hash-exact.

    Scale shape: each recursion level is one equi-join of the frontier
    against the edge set (the same per-round join every hand-rolled loop
    in this module does — CC, LPA, PageRank); the depth cap bounds the
    path fan-out at out-degree^depth over a support-pruned sparse graph.
    The engine-level win being demonstrated: the loop lives INSIDE one
    declarative query (no driver-side iteration, no per-round checkpoint
    management), which is the right tool when the recursion is shallow
    and bounded. The edge SET is materialized once behind a temp view
    (see the comment on ``_REACH_SQL``) — the recursion itself is what
    runs in Catalyst."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    edges.createOrReplaceTempView("gx_reach_edges")
    return spark.sql(_REACH_SQL.format(edges="gx_reach_edges"))


# --------------------------------------------------------------------------
# Quality-aware dedup: keep the BEST document per near-dup cluster
# --------------------------------------------------------------------------

_KEEP_BEST_ORACLE = f"""
{_CC_COMP_CTES}
SELECT c.component,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(min(CASE WHEN rnk = 1 THEN c.doc_id END) AS BIGINT) AS keeper_id,
       CAST(min(CASE WHEN rnk = 1 THEN n_chars END) AS BIGINT) AS keeper_chars
FROM (
  SELECT c.doc_id, c.component, d.n_chars,
         row_number() OVER (
           PARTITION BY c.component ORDER BY d.n_chars DESC, c.doc_id
         ) AS rnk
  FROM comp c JOIN documents d USING (doc_id)
) c
GROUP BY c.component
ORDER BY c.component
"""


@register(
    "dedup_keep_best",
    _KEEP_BEST_ORACLE,
    doc="near-dup clusters keeping the HIGHEST-QUALITY member (longest doc, tie min id)",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonicalization: production dedup keeps the BEST
    member of each near-dup cluster, not the smallest id — here best =
    longest document (``n_chars``; swap in any deterministic quality
    score), ties broken by min doc_id so the choice is reproducible.

    Composition of existing primitives: n-gram Jaccard pairs → connected
    components (iterative min-label) → one argmax per cluster, folded
    into a single ``min(struct(-n_chars, doc_id))`` aggregate on the
    component key (the same no-window argmax as `graph_communities_lpa`
    — the shuffle carries (component, two longs), and nothing funnels
    through one task). The oracle replays the full chain: recursive-CTE
    closure + ANSI row_number argmax."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        comp.join(docs, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("neg"), F.col("doc_id").alias("id")
                )
            ).alias("best"),
        )
        .select(
            "component",
            "cluster_size",
            F.col("best.id").alias("keeper_id"),
            (-F.col("best.neg")).alias("keeper_chars"),
        )
        .orderBy("component")
    )


# --------------------------------------------------------------------------
# k-core decomposition (bounded synchronous peeling, oracle-exact)
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_MAX_ROUNDS = 12
_KCORE_TOPK = 20


def _kcore_oracle() -> str:
    """Unrolled DuckDB replay of the synchronous peeling rounds: each
    round recomputes degrees and drops every node below k — identical,
    idempotent-after-convergence integer filtering on both engines, so
    a fixed round budget keeps the fixpoint SQL-expressible (the same
    unroll trick as `graph_communities_lpa`). Every per-round CTE is
    MATERIALIZED: each round references the previous edge set three
    times, so DuckDB's default inline-on-reference would re-expand the
    chain ~3^rounds times (observed as a too-many-open-files explosion
    on the base parquet scan)."""
    parts = [
        f"""WITH op AS MATERIALIZED (SELECT o, p FROM {_DUCK_CAPPED_OP}),
e0 AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_SUPPORT}
)"""
    ]
    cur = "e0"
    for i in range(1, _KCORE_MAX_ROUNDS + 1):
        parts.append(
            f""",
deg{i} AS MATERIALIZED (
  SELECT n, count(*) AS d FROM (
    SELECT pa AS n FROM {cur} UNION ALL SELECT pb AS n FROM {cur}
  ) GROUP BY n
),
keep{i} AS (SELECT n FROM deg{i} WHERE d >= {_KCORE_K}),
e{i} AS MATERIALIZED (
  SELECT pa, pb FROM {cur}
  WHERE pa IN (SELECT n FROM keep{i}) AND pb IN (SELECT n FROM keep{i})
)"""
        )
        cur = f"e{i}"
    parts.append(
        f""",
core_deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT pa AS n FROM {cur} UNION ALL SELECT pb AS n FROM {cur}
  ) GROUP BY n
),
totals AS (
  SELECT
    CAST(count(*) AS BIGINT)                                    AS n_core_nodes,
    CAST((SELECT count(*) FROM {cur}) AS BIGINT)                AS n_core_edges,
    coalesce(min(d) >= {_KCORE_K}, TRUE)                        AS converged
  FROM core_deg
)
SELECT cd.n AS node, CAST(cd.d AS BIGINT) AS core_degree,
       t.n_core_nodes, t.n_core_edges, t.converged
FROM core_deg cd CROSS JOIN totals t
ORDER BY core_degree DESC, node
LIMIT {_KCORE_TOPK}"""
    )
    return "".join(parts)


@register(
    "graph_kcore",
    _kcore_oracle(),
    doc=f"{_KCORE_K}-core decomposition (synchronous peeling, <= {_KCORE_MAX_ROUNDS} rounds), top-{_KCORE_TOPK} by in-core degree",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the part co-occurrence graph: repeatedly
    remove every node with degree < k until none remain — the standard
    density filter that strips pendant/tree structure before community or
    cohesion analysis (and, in a dedup pipeline, isolates the tightly
    inter-duplicated core of a template-spam cluster).

    Determinism contract: both engines run the SAME bounded synchronous
    schedule — at most ``_KCORE_MAX_ROUNDS`` peel rounds, each dropping
    ALL currently-under-k nodes at once. Peeling is idempotent after
    convergence, so the unrolled DuckDB oracle (fixed rounds) and the
    Spark loop (early exit once a round removes nothing — the remaining
    oracle rounds are no-ops) land on the same edge set; a ``converged``
    flag rides along so a round-budget truncation is visible in the
    output rather than silent. Output: top-k core members by in-core
    degree plus 1-row totals.

    Scale shape: each round is one degree aggregate + two semi-joins on
    the node id (never all-pairs), with the shrinking edge set
    localCheckpointed so the plan stays one round deep; the convergence
    probe is a count on the (bounded, already-aggregated) under-k set.
    Synchronous peeling needs O(peel-depth) rounds — the distributed
    -k-core default (Montresor et al.); degeneracy-ordering variants
    trade more machinery for fewer rounds and keep the same per-round
    join primitive."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    for _ in range(_KCORE_MAX_ROUNDS):
        # Checkpoint the (node-sized) degree table: the convergence probe
        # AND the keep-set filter both consume it, and without the cut
        # each round would run the degree aggregate twice. The cut is
        # LAZY and the probe is a count() over it (optimization r12):
        # the count job materializes the checkpoint AND answers the
        # convergence question in one probe. localCheckpoint, NOT persist:
        # each round references the previous generation 3x (union + two
        # semi-joins via keep), so without lineage truncation the logical
        # plan grows 3^rounds and the driver OOMs analyzing it (observed).
        deg = (
            edges.select(F.col("pa").alias("n"))
            .unionAll(edges.select(F.col("pb").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=False, storageLevel=CKPT_LEVEL)
        )
        if deg.filter(F.col("d") < _KCORE_K).count() == 0:
            break
        keep = deg.filter(F.col("d") >= _KCORE_K).select("n")
        edges = (
            edges.join(keep.withColumnRenamed("n", "pa"), "pa", "left_semi")
            .join(keep.withColumnRenamed("n", "pb"), "pb", "left_semi")
            .select("pa", "pb")
            .localCheckpoint(eager=False, storageLevel=CKPT_LEVEL)
        )
    core_deg = (
        edges.select(F.col("pa").alias("n"))
        .unionAll(edges.select(F.col("pb").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    totals = core_deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_core_nodes"),
        F.coalesce(F.min("d") >= _KCORE_K, F.lit(True)).alias("converged"),
    ).crossJoin(edges.agg(F.count(F.lit(1)).cast("long").alias("n_core_edges")))
    return (
        core_deg.select(F.col("n").alias("node"), F.col("d").cast("long").alias("core_degree"))
        .orderBy(F.desc("core_degree"), F.asc("node"))
        .limit(_KCORE_TOPK)
        .crossJoin(F.broadcast(totals))
        .select("node", "core_degree", "n_core_nodes", "n_core_edges", "converged")
        .orderBy(F.desc("core_degree"), F.asc("node"))
    )


# --------------------------------------------------------------------------
# Link prediction (common-neighbor Jaccard over non-edges)
# --------------------------------------------------------------------------

_LINKPRED_MAX_DEG = 256  # hubs past this degree don't generate wedges
_LINKPRED_TOPK = 20

_LINKPRED_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), adj AS (
  SELECT pa AS n, pb AS nbr FROM e UNION ALL SELECT pb AS n, pa AS nbr FROM e
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n
), wedges AS (
  SELECT x.nbr AS a, y.nbr AS b, CAST(count(*) AS BIGINT) AS common_neighbors
  FROM adj x
  JOIN adj y ON x.n = y.n AND x.nbr < y.nbr
  JOIN deg dc ON dc.n = x.n AND dc.d <= {_LINKPRED_MAX_DEG}
  GROUP BY x.nbr, y.nbr
), cand AS (
  SELECT w.a, w.b, w.common_neighbors FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
)
SELECT
  c.a                                                             AS node_a,
  c.b                                                             AS node_b,
  c.common_neighbors,
  da.d                                                            AS deg_a,
  db.d                                                            AS deg_b,
  round(CAST(c.common_neighbors AS DOUBLE)
        / (da.d + db.d - c.common_neighbors), 6)                  AS jaccard
FROM cand c
JOIN deg da ON da.n = c.a
JOIN deg db ON db.n = c.b
ORDER BY jaccard DESC, node_a, node_b
LIMIT {_LINKPRED_TOPK}
"""


@register(
    "graph_jaccard_linkpred",
    _LINKPRED_ORACLE,
    doc=f"top-{_LINKPRED_TOPK} predicted links by common-neighbor Jaccard (non-edges only)",
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-occurrence graph: for every
    non-adjacent pair with at least one common neighbor, score the pair
    by neighbor-set Jaccard |N(a) INTERSECT N(b)| / |N(a) UNION N(b)|
    (Liben-Nowell & Kleinberg, CIKM'03 — the classic unsupervised
    link-prediction baseline) and return the top-20 predicted links.

    Scale shape: common-neighbor counts come from WEDGES — each node
    emits its neighbor pairs map-side from one sorted adjacency array
    (the same single-shuffle basket-explode discipline as triangle
    count; no self-join of the corpus). Wedge fan-out is sum(deg^2)
    over wedge CENTERS, so hubs past ``_LINKPRED_MAX_DEG`` neighbors
    are excluded from serving as centers — the standard heavy-hitter
    guard in similarity joins (a hub's wedge set is quadratic in its
    degree while its Jaccard contribution tends to zero: the union term
    grows with the hub's degree too). The cap changes outputs, so the
    ORACLE replays it — cap semantics are part of the operator spec.
    Candidate pairs anti-join the edge set (predictions must be
    NON-edges), degrees join on the node key (never broadcast — the
    degree table grows with the graph), the Jaccard division is
    IEEE-deterministic from exact integer counts, and top-k is
    TakeOrderedAndProject."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    res = jaccard_linkpred_scores(edges, max_deg=_LINKPRED_MAX_DEG)
    return res.orderBy(F.desc("jaccard"), "node_a", "node_b").limit(_LINKPRED_TOPK)


def jaccard_linkpred_scores(edges: DataFrame, max_deg: int = _LINKPRED_MAX_DEG) -> DataFrame:
    """Common-neighbor Jaccard for every non-adjacent pair of ``edges``
    (columns pa < pb) with at least one common sub-hub neighbor. Factored
    edges-in so the hub-cap path is testable on synthetic graphs; see
    graph_jaccard_linkpred for the scale rationale."""
    adj = edges.select(F.col("pa").alias("n"), F.col("pb").alias("nbr")).unionAll(
        edges.select(F.col("pb").alias("n"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # Neighbor lists once; hub centers drop out BEFORE the wedge explode.
    nbrs = (
        adj.groupBy("n")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
        .filter(F.size("ns") <= max_deg)
    )
    wedges = nbrs.select(
        F.explode(
            F.expr(
                "flatten(transform(ns, (x, i) -> "
                "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("e")
    ).select("e.a", "e.b")
    common = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors")
    )
    cand = common.join(
        edges.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return (
        cand.join(deg.select(F.col("n").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("deg_b")), "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common_neighbors",
            "deg_a",
            "deg_b",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Degree assortativity (Newman's r over the co-occurrence graph)
# --------------------------------------------------------------------------

_ASSORT_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e
  ) GROUP BY n
), de AS (
  SELECT da.d AS x, db.d AS y FROM e
    JOIN deg da ON da.n = e.pa JOIN deg db ON db.n = e.pb
  UNION ALL
  SELECT db.d AS x, da.d AS y FROM e
    JOIN deg da ON da.n = e.pa JOIN deg db ON db.n = e.pb
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS mm,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(y * y) AS HUGEINT) AS syy
  FROM de
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST(mm / 2 AS BIGINT) AS n_edges,
       round(CAST(mm * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(mm * sxx - sx * sx AS DOUBLE)
                    * CAST(mm * syy - sy * sy AS DOUBLE)), 6) AS assortativity
FROM m
"""


@register(
    "graph_assortativity",
    _ASSORT_ORACLE,
    doc="Newman degree assortativity of the co-occurrence graph (exact integer moments)",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all edges — positive means hubs attach to
    hubs (social-network shape), negative means hub-and-spoke
    (dependency/retail shape). The one-number structural fingerprint
    that tells you whether the hub caps in the dedup/link-prediction
    family will actually engage.

    Exactness: degrees are integers, each edge contributes both
    orientations (the standard symmetrization), and all five correlation
    moments are exact decimal(38,0)/HUGEINT sums; r is one deterministic
    double expression of those integers (factors multiplied after the
    double cast — the decimal product would overflow).

    Scale shape: reuses the shared one-shuffle basket-explode edge
    builder (`cooccurrence_edges`, caps replayed in the oracle); degrees
    are one aggregate of the edge list; the two degree joins are
    node-keyed equi-joins; the moment fold is a 1-row aggregate. Nothing
    quadratic anywhere."""
    return assortativity_from_edges(cooccurrence_edges(spark, sf_dir))


def assortativity_from_edges(raw_edges: DataFrame) -> DataFrame:
    """Assortativity core over any (pa, pb) undirected edge frame —
    factored out so tests can pin known-shape graphs (a star is exactly
    r = -1; a clique's variance degenerates)."""
    edges = raw_edges.persist(CKPT_LEVEL)  # feeds deg + both joins
    deg = (
        edges.select(F.col("pa").alias("n"))
        .unionAll(edges.select(F.col("pb").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist(CKPT_LEVEL)  # feeds the node count and two degree joins
    )
    da = deg.select(F.col("n").alias("pa"), F.col("d").alias("x"))
    db = deg.select(F.col("n").alias("pb"), F.col("d").alias("y"))
    joined = edges.join(da, "pa").join(db, "pb")
    de = joined.select("x", "y").unionAll(
        joined.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    m = de.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("mm"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    num = (F.col("mm") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("mm") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("mm") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.crossJoin(F.broadcast(n_nodes)).select(
        "n_nodes",
        F.expr("cast(mm div 2 as bigint)").alias("n_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (bipartite customer → part, 2 unrolled rounds)
# --------------------------------------------------------------------------

_HITS_TOPK = 20


_HITS_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
h1 AS (SELECT c, CAST(count(*) AS BIGINT) AS h1 FROM edges GROUP BY c),
a1 AS (
  SELECT e.p, CAST(sum(h1.h1) AS BIGINT) AS a1
  FROM edges e JOIN h1 ON h1.c = e.c GROUP BY e.p
),
h2 AS (
  SELECT e.c, CAST(sum(a1.a1) AS BIGINT) AS h2
  FROM edges e JOIN a1 ON a1.p = e.p GROUP BY e.c
),
a2 AS (
  SELECT e.p, CAST(sum(h2.h2) AS BIGINT) AS a2
  FROM edges e JOIN h2 ON h2.c = e.c GROUP BY e.p
)
SELECT a2.p AS part_key, a1.a1, a2.a2,
       CAST(count(*) OVER () AS BIGINT) AS n_parts_total
FROM a2 JOIN a1 ON a1.p = a2.p
ORDER BY a2.a2 DESC, part_key
LIMIT {_HITS_TOPK}
"""


@register(
    "graph_hits_bipartite",
    _HITS_ORACLE,
    doc=f"HITS authorities (2 unrolled integer rounds) on the customer→part graph, top {_HITS_TOPK}",
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999 — public) on the bipartite purchase graph:
    customers are hubs, parts are authorities; two mutual-reinforcement
    rounds — h₁ = out-degree, a₁ = Σ h₁ over buyers, h₂ = Σ a₁ over
    bought parts, a₂ = Σ h₂ — rank the top-{_HITS_TOPK} authority parts.
    The link-analysis sibling of `graph_pagerank`: PageRank needs a
    fixed point (rows-only, numpy-pinned); HITS truncated to a fixed
    round count stays EXACT-integer and fully oracle-checkable, because
    without normalization each score is just a path-count — a₂(p) =
    #(3-step paths ending at p) weighted by edge multiplicity.

    Exactness: every score is an exact BIGINT path count (degrees ≤10³
    ⇒ a₂ ≤ ~10⁹ at fixture scales; DECIMAL headroom documented for
    deeper unrolls). Top-k is (a₂ desc, part_key) — total order.

    Scale: the edge list is the only data-scale table; each round is
    ONE equi-join of the static edge table with a (node, long) score
    table — both hash-partitioned on the join key (bucket the edge
    table at cluster scale and the static side never reshuffles) — plus
    one aggregate. The final top-k is TakeOrderedAndProject."""
    from pyspark import StorageLevel

    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # persist(), not localCheckpoint(): four rounds reuse this table, and
    # the SQL cache stores it as compressed columnar batches that spill —
    # the checkpoint path pinned DESERIALIZED row objects, which at sf10
    # (tens of millions of 2-long edges) was most of the 8 GiB heap the
    # r11 sweep OOM'd on (VERDICT r11 task #4).
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    h1 = edges.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("h1"))
    a1 = (
        edges.join(h1, "c")
        .groupBy("p")
        .agg(F.sum("h1").cast("long").alias("a1"))
    )
    h2 = (
        edges.join(a1, "p")
        .groupBy("c")
        .agg(F.sum("a1").cast("long").alias("h2"))
    )
    a2 = (
        edges.join(h2, "c")
        .groupBy("p")
        .agg(F.sum("h2").cast("long").alias("a2"))
    )
    n_parts = a2.agg(F.count(F.lit(1)).cast("long").alias("n_parts_total"))
    return (
        a2.join(a1, "p")
        .crossJoin(F.broadcast(n_parts))
        .select(F.col("p").alias("part_key"), "a1", "a2", "n_parts_total")
        .orderBy(F.col("a2").desc(), "part_key")
        .limit(_HITS_TOPK)
    )


# --------------------------------------------------------------------------
# Clustering coefficient (global + average local) on the co-occurrence graph
# --------------------------------------------------------------------------

_CLUSTER_COEF_ORACLE = f"""
WITH op AS MATERIALIZED (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), deg AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e
  ) GROUP BY n
), tri AS MATERIALIZED (
  SELECT x.pa AS a, x.pb AS b, y.pb AS c
  FROM e x JOIN e y ON y.pa = x.pb
         JOIN e z ON z.pa = x.pa AND z.pb = y.pb
), tn AS MATERIALIZED (
  SELECT unnest([a, b, c]) AS n FROM tri
), tcount AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS t FROM tn GROUP BY n
), pernode AS MATERIALIZED (
  SELECT deg.n, deg.d, coalesce(tcount.t, 0) AS t
  FROM deg LEFT JOIN tcount ON tcount.n = deg.n
), elig AS MATERIALIZED (
  SELECT CAST(2 * CAST(t AS HUGEINT) * 1000000000
              // (CAST(d AS HUGEINT) * (d - 1)) AS BIGINT) AS cc_e9
  FROM pernode WHERE d >= 2
)
SELECT
  CAST((SELECT count(*) FROM pernode) AS BIGINT) AS n_nodes,
  CAST((SELECT count(*) FROM elig) AS BIGINT) AS n_eligible,
  CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
  CAST((SELECT sum(CAST(d AS HUGEINT) * (d - 1) // 2) FROM pernode) AS BIGINT) AS n_wedges,
  CAST((SELECT sum(cc_e9) FROM elig) AS BIGINT) AS sum_local_cc_e9,
  round(3.0 * (SELECT count(*) FROM tri)
        / (SELECT CAST(sum(CAST(d AS HUGEINT) * (d - 1) // 2) AS DOUBLE) FROM pernode), 6)
    AS global_cc,
  round(CAST((SELECT sum(cc_e9) FROM elig) AS DOUBLE)
        / (SELECT count(*) FROM elig) / 1000000000.0, 6) AS avg_local_cc
"""


@register(
    "graph_clustering_coefficient",
    _CLUSTER_COEF_ORACLE,
    doc="global + average-local clustering coefficient (per-node exact triangle credit)",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watts-Strogatz clustering coefficients over the part co-occurrence
    graph: global C = 3·triangles/wedges AND the average LOCAL
    coefficient (mean over nodes with degree ≥ 2 of 2·t_v/(d_v·(d_v−1)))
    — the two standard "how clique-ish is this graph" readouts, which
    deliberately disagree on hub-heavy graphs (global is wedge-weighted,
    local is node-weighted). Extends `graph_triangle_count` from one
    scalar to per-node triangle credit.

    Exactness: each triangle credits its 3 nodes via an explode off the
    closed-wedge triples (exact integers); each local coefficient
    floor-quantizes to 1e-9 BEFORE the sum (the PSI/χ² recipe — a float
    mean of per-node ratios would be accumulation-order-dependent), so
    ``sum_local_cc_e9`` is an exact integer cross-engine; the two
    averages are single IEEE expressions over exact sums.

    Scale: the degree-oriented wedge join bounds fan-out by sqrt(2m)
    (Suri & Vassilvitskii); per-node credit is one explode + groupBy on
    triangle rows (≤ wedge count); everything else is node-grain."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    deg = (
        edges.select(F.col("pa").alias("n"))
        .unionAll(edges.select(F.col("pb").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .persist(CKPT_LEVEL)
    )
    is_fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("pa") < F.col("pb"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("n", "pa").withColumnRenamed("d", "da"), "pa")
        .join(deg.withColumnRenamed("n", "pb").withColumnRenamed("d", "db"), "pb")
        .select(
            F.when(is_fwd, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(is_fwd, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
            F.greatest("da", "db").alias("deg_dst"),
        )
        .persist(CKPT_LEVEL)
    )
    w1, w2 = ed.alias("w1"), ed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (
            (F.col("w1.deg_dst") < F.col("w2.deg_dst"))
            | (
                (F.col("w1.deg_dst") == F.col("w2.deg_dst"))
                & (F.col("w1.dst") < F.col("w2.dst"))
            )
        ),
    ).select(
        F.col("w1.src").alias("wsrc"), F.col("w1.dst").alias("ta"), F.col("w2.dst").alias("tb")
    )
    closed = wedges.join(
        ed.select(F.col("src").alias("ta"), F.col("dst").alias("tb")), ["ta", "tb"], "leftsemi"
    ).persist(CKPT_LEVEL)

    tcount = (
        closed.select(F.explode(F.array("wsrc", "ta", "tb")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    pernode = deg.join(tcount, "n", "left").select(
        "d", F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("t")
    )
    elig = pernode.filter(F.col("d") >= 2).select(
        F.expr(
            "CAST(2 * CAST(t AS DECIMAL(38,0)) * 1000000000"
            " div (CAST(d AS DECIMAL(38,0)) * (d - 1)) AS BIGINT)"
        ).alias("cc_e9")
    )
    node_stats = pernode.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    elig_stats = elig.agg(
        F.count(F.lit(1)).cast("long").alias("n_eligible"),
        F.sum("cc_e9").cast("long").alias("sum_local_cc_e9"),
    )
    tri_stats = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return (
        node_stats.crossJoin(tri_stats)
        .crossJoin(elig_stats)
        .selectExpr(
            "n_nodes",
            "n_eligible",
            "n_triangles",
            "n_wedges",
            "sum_local_cc_e9",
            "round(3.0 * n_triangles / CAST(n_wedges AS DOUBLE), 6) AS global_cc",
            "round(CAST(sum_local_cc_e9 AS DOUBLE) / n_eligible / 1000000000.0, 6)"
            " AS avg_local_cc",
        )
    )


# --------------------------------------------------------------------------
# Bounded-round single-source shortest paths (weighted Bellman-Ford)
# --------------------------------------------------------------------------

_SSSP_ROUNDS = 4
_SSSP_TOP = 20
# Edge cost: inverse co-purchase support (frequently co-ordered parts are
# "closer"), kept integer so every relaxed distance is an exact BIGINT.
_SSSP_COST = "CAST(1000000 DIV support AS BIGINT)"
_SSSP_COST_DUCK = "CAST(1000000 // support AS BIGINT)"


def _sssp_oracle() -> str:
    rounds = []
    for i in range(_SSSP_ROUNDS):
        rounds.append(
            f"""d{i + 1} AS MATERIALIZED (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT dir.v AS node, d{i}.dist + dir.w AS dist
    FROM d{i} JOIN dir ON dir.u = d{i}.node
  ) GROUP BY node
)"""
        )
    return f"""
WITH op AS (SELECT o, p FROM {_DUCK_CAPPED_OP}),
e AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS support
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
),
src AS (SELECT min(pa) AS s FROM e),
dir AS (
  SELECT pa AS u, pb AS v, {_SSSP_COST_DUCK} AS w FROM e
  UNION ALL
  SELECT pb AS u, pa AS v, {_SSSP_COST_DUCK} AS w FROM e
),
d0 AS (SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM src),
{",".join(rounds)}
SELECT node, dist
FROM d{_SSSP_ROUNDS}
ORDER BY dist, node
LIMIT {_SSSP_TOP}
"""


@register(
    "graph_bounded_sssp",
    _sssp_oracle(),
    doc=f"single-source shortest paths, {_SSSP_ROUNDS} Bellman-Ford rounds on the co-purchase graph",
)
def graph_bounded_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths on the part co-purchase
    graph (edge cost = 1e6 // co-order support, so high-affinity parts
    are close): the 4-round synchronous Bellman-Ford that finds
    every part within 4 hops of the source — the "related products
    neighborhood" query, and the template for any bounded-radius
    traversal (fraud rings, lineage blast-radius).

    Exactness: integer edge costs make every relaxed distance an exact
    BIGINT min; the source is the deterministic min node id; output is
    the 20 nearest (dist, node)-ordered — a total order.

    Scale: each round is ONE hash join of the frontier against the
    node-keyed directed edge list followed by a min-aggregate — never a
    broadcast of unbounded state — with a lazy `persist(CKPT_LEVEL)` cut
    per round (safe here: each round references its predecessor ONCE, so
    the un-truncated logical plan grows linearly, r12 §11). Rounds are a fixed
    constant, so the plan is 4 joins deep, not data-dependent."""
    edges = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= MAX_BASKET)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("e")
        )
        .select("e.pa", "e.pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= _TRI_MIN_SUPPORT)
    )
    edges = edges.persist(CKPT_LEVEL)
    dir_e = (
        edges.selectExpr("pa AS u", "pb AS v", f"{_SSSP_COST} AS w")
        .unionAll(edges.selectExpr("pb AS u", "pa AS v", f"{_SSSP_COST} AS w"))
        .persist(CKPT_LEVEL)
    )
    src = edges.agg(F.min("pa").alias("s"))
    d = src.select(F.col("s").alias("node"), F.lit(0).cast("long").alias("dist"))
    for _ in range(_SSSP_ROUNDS):
        relaxed = d.join(dir_e, d.node == dir_e.u).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        d = (
            d.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            # persist lineage cut per round (r12): no build-time stage
            # execution, plans stay one round deep via cache substitution.
            .persist(CKPT_LEVEL)
        )
    return d.orderBy("dist", "node").limit(_SSSP_TOP)


# --------------------------------------------------------------------------
# Degree distribution of the co-occurrence graph
# --------------------------------------------------------------------------

_DEGREE_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT pa AS n FROM e UNION ALL SELECT pb AS n FROM e
  ) GROUP BY n
),
hist AS (SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY d),
tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS total FROM hist)
SELECT degree, n_nodes,
       CAST(sum(n_nodes) OVER (ORDER BY degree
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nodes,
       CAST(n_nodes * 1000000 // tot.total AS BIGINT) AS share_ppm
FROM hist, tot
ORDER BY degree
"""


@register(
    "graph_degree_distribution",
    _DEGREE_ORACLE,
    doc="degree histogram of the part co-occurrence graph (+ cumulative and ppm shares)",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first chart anyone draws of a graph: how many nodes have
    degree d, cumulatively and as a share — the heavy-tail check that
    decides whether the downstream algorithms need skew handling (a
    fat-tailed basket graph is exactly where the degree-oriented
    triangle join and the salted joins earn their keep). Complements
    `graph_assortativity` (who connects to whom) with the raw margin.

    Exactness: degrees, the histogram, and shares are exact integers.

    Scale: rides `cooccurrence_edges` (capped basket explode, support
    prune); degrees are one node-keyed aggregate; the histogram and its
    running sum live on the degree-value dictionary (bounded by the max
    degree), using the range-partitioned running-sum machinery."""
    from gluettalax_spark.operators.rank import grouped_running_sum

    edges = cooccurrence_edges(spark, sf_dir)
    # Both endpoints explode from each edge row IN-ROW (optimization r12,
    # guide §2.1): the unionAll form executed the whole basket-explode
    # edge pipeline twice, once per branch. Same multiset of node ids.
    deg = (
        edges.select(F.explode(F.array("pa", "pb")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    hist = (
        deg.groupBy(F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .withColumn("_g", F.lit(1))
    )
    hist = hist.persist(CKPT_LEVEL)  # feeds the total AND the running sum
    tot = hist.agg(F.sum("n_nodes").cast("long").alias("total"))
    cum = grouped_running_sum(hist, ["_g"], ["degree"], "n_nodes", "cum_nodes")
    return (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "degree",
            "n_nodes",
            "CAST(cum_nodes AS BIGINT) AS cum_nodes",
            "CAST(n_nodes * 1000000 DIV total AS BIGINT) AS share_ppm",
        )
        .orderBy("degree")
    )


# --------------------------------------------------------------------------
# Adamic-Adar link prediction (rare-neighbor-weighted common neighbors)
# --------------------------------------------------------------------------

# Per-center wedge weight floor(1e8 / ln(d_z)) — quantized BEFORE the sum
# (the exp/ln libm-ulp discipline), so AA scores are exact int64 sums.
# Centers need >= 2 neighbors to form a wedge, so ln(d_z) >= ln 2 > 0.
_AA_SCALE = 100_000_000

_ADAMIC_ADAR_ORACLE = f"""
WITH op AS (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), adj AS (
  SELECT pa AS n, pb AS nbr FROM e UNION ALL SELECT pb AS n, pa AS nbr FROM e
), deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n
), wedges AS (
  SELECT x.nbr AS a, y.nbr AS b,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(CAST(floor({_AA_SCALE} / ln(CAST(dc.d AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS aa_e8
  FROM adj x
  JOIN adj y ON x.n = y.n AND x.nbr < y.nbr
  JOIN deg dc ON dc.n = x.n AND dc.d <= {_LINKPRED_MAX_DEG}
  GROUP BY x.nbr, y.nbr
), cand AS (
  SELECT w.a, w.b, w.common_neighbors, w.aa_e8 FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
)
SELECT c.a AS node_a, c.b AS node_b, c.common_neighbors,
       da.d AS deg_a, db.d AS deg_b, c.aa_e8
FROM cand c
JOIN deg da ON da.n = c.a
JOIN deg db ON db.n = c.b
ORDER BY c.aa_e8 DESC, node_a, node_b
LIMIT {_LINKPRED_TOPK}
"""


@register(
    "graph_adamic_adar",
    _ADAMIC_ADAR_ORACLE,
    doc=f"top-{_LINKPRED_TOPK} predicted links by Adamic-Adar (exact integer e8 scores)",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003 — public): like
    `graph_jaccard_linkpred` but each common neighbor z is weighted
    1/ln(deg z), so a RARE shared neighbor certifies a link far more
    strongly than a hub everyone touches — the standard fix for
    Jaccard's hub-pollution failure, usually the strongest unsupervised
    link predictor of the classic family on co-occurrence graphs.

    Exactness: each center's wedge weight floor(1e8/ln d) quantizes to
    an integer BEFORE summation (the libm-ulp discipline), so every AA
    score is an exact int64 sum both engines replay; top-k order is
    (aa_e8 desc, node_a, node_b) — total.

    Scale shape: identical to the Jaccard rung — wedges explode
    map-side from each center's sorted adjacency array, hub centers
    past {_LINKPRED_MAX_DEG} neighbors are excluded BEFORE the explode
    (the oracle replays the cap: it is part of the spec), candidates
    anti-join the edge set, degrees join on the node key, top-k is
    TakeOrderedAndProject."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    adj = edges.select(F.col("pa").alias("n"), F.col("pb").alias("nbr")).unionAll(
        edges.select(F.col("pb").alias("n"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nbrs = (
        adj.groupBy("n")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
        # Degree-1 centers form no wedges anyway, and must drop BEFORE the
        # weight projection: ln(1) = 0 and ANSI mode turns 1e8/0 into an
        # error even on rows the explode would discard.
        .filter((F.size("ns") >= 2) & (F.size("ns") <= _LINKPRED_MAX_DEG))
        .withColumn(
            "w",
            F.expr(f"CAST(floor({_AA_SCALE} / ln(CAST(size(ns) AS DOUBLE))) AS BIGINT)"),
        )
    )
    wedges = nbrs.select(
        "w",
        F.explode(
            F.expr(
                "flatten(transform(ns, (x, i) -> "
                "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("e"),
    ).select("e.a", "e.b", "w")
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("w").cast("long").alias("aa_e8"),
    )
    cand = scored.join(
        edges.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    return (
        cand.join(deg.select(F.col("n").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("deg_b")), "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common_neighbors",
            "deg_a",
            "deg_b",
            "aa_e8",
        )
        .orderBy(F.desc("aa_e8"), "node_a", "node_b")
        .limit(_LINKPRED_TOPK)
    )


# --------------------------------------------------------------------------
# Bounded harmonic centrality (radius 2) over the co-occurrence graph
# --------------------------------------------------------------------------

_HARMONIC_MAX_DEG = 256  # hub centers don't generate 2-hop wedges (linkpred cap)

_HARMONIC_2HOP_ORACLE = f"""
WITH op AS MATERIALIZED (
  SELECT o, p FROM {_DUCK_CAPPED_OP}
), e AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_TRI_MIN_SUPPORT}
), adj AS MATERIALIZED (
  SELECT pa AS n, pb AS nbr FROM e UNION ALL SELECT pb AS n, pa AS nbr FROM e
), deg AS MATERIALIZED (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY n
), w AS MATERIALIZED (
  SELECT DISTINCT a.nbr AS x, b.nbr AS y
  FROM adj a JOIN adj b ON a.n = b.n AND a.nbr < b.nbr
  WHERE a.n IN (SELECT n FROM deg WHERE d <= {_HARMONIC_MAX_DEG})
), p2 AS MATERIALIZED (
  SELECT x, y FROM w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.x AND e.pb = w.y)
), n2 AS (
  SELECT n, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT x AS n FROM p2 UNION ALL SELECT y AS n FROM p2) GROUP BY n
)
SELECT d.n AS node, d.d AS n_1hop,
       CAST(coalesce(n2.c, 0) AS BIGINT) AS n_2hop,
       CAST(d.d * 1000 + coalesce(n2.c, 0) * 500 AS BIGINT) AS harmonic_milli
FROM deg d LEFT JOIN n2 ON n2.n = d.n
ORDER BY harmonic_milli DESC, node
LIMIT 20
"""


@register(
    "graph_harmonic_2hop",
    _HARMONIC_2HOP_ORACLE,
    doc="radius-2 harmonic centrality (milli-units) over the part co-occurrence graph, top 20",
)
def graph_harmonic_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated harmonic centrality h(v) = sum over u of 1/dist(u,v) cut at
    radius 2 — i.e. |N₁(v)| + |N₂(v)|/2, in exact integer milli-units.
    The "how locally central is this product" readout: a multi-node
    COMPLEMENT of `graph_bounded_sssp` (one source, 4 hops) — every node
    gets a score, bounded radius keeps it one wedge pass, not an APSP.
    Radius-2 truncation is the standard scale compromise (full harmonic
    centrality needs all-pairs distances).

    Exactness: both terms are exact neighbor-set counts; ×1000/×500
    integer weights replace the 1/2 float. Top-20 by (score desc, node)
    is a total order.

    Scale: N₂ comes from the SAME capped wedge machinery as
    `graph_jaccard_linkpred` — hub centers past _HARMONIC_MAX_DEG=256
    neighbors don't emit wedges (quadratic fan-out, vanishing score
    contribution), and the cap is REPLAYED in the oracle as part of the
    operator spec. One basket explode, one wedge explode, two key-hash
    aggregates; the direct-edge exclusion is an anti-join on the edge
    list. Nothing is corpus-quadratic."""
    edges = cooccurrence_edges(spark, sf_dir).persist(CKPT_LEVEL)
    adj = edges.select(F.col("pa").alias("n"), F.col("pb").alias("nbr")).unionAll(
        edges.select(F.col("pb").alias("n"), F.col("pa").alias("nbr"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nbrs = (
        adj.groupBy("n")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
        .filter(F.size("ns") <= _HARMONIC_MAX_DEG)
    )
    wedges = (
        nbrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS a, y AS b))))"
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
    )
    p2 = wedges.join(
        edges.select(F.col("pa").alias("a"), F.col("pb").alias("b")), ["a", "b"], "left_anti"
    )
    n2 = (
        p2.select(F.col("a").alias("n"))
        .unionAll(p2.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        deg.join(n2, "n", "left")
        .selectExpr(
            "n AS node",
            "d AS n_1hop",
            "CAST(coalesce(c, 0) AS BIGINT) AS n_2hop",
            "CAST(d * 1000 + coalesce(c, 0) * 500 AS BIGINT) AS harmonic_milli",
        )
        .orderBy(F.desc("harmonic_milli"), "node")
        .limit(20)
    )
