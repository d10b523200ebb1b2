"""Graph iteration ([EXT]): PageRank over the customer↔supplier trade
graph derived from orders⋈lineitem.

Iterative algorithms are the one class Catalyst cannot plan end-to-end;
the loop lives on the driver but every iteration is pure DataFrame ops —
one shuffle (contributions keyed by destination) plus one co-keyed join
per iteration, the same per-iteration shape Pregel/GraphX would run.

Cross-engine exactness: ranks live in ×1e12 fixed-point integers and
every operation is integer arithmetic — floor division for the degree
split and the damping factor (0.85 = 17/20, 0.15/N = 15·SCALE/(100·N)) —
so each iteration is bit-identical in Spark and DuckDB and the oracle
can unroll the same three iterations in SQL. (Double-valued PageRank
would diverge: per-destination sums are order-dependent in floating
point.)

Scale: edges are the heavy table; they shuffle once per iteration on
src (join with ranks) and once on dst (contribution sum) — both
AQE-coalesced; the rank vector is one row per node, always the small
side. At 100 TB you would persist the partitioned edge table once and
reuse the partitioning every iteration (bucketed by src).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postgres_es_cdc_spark.catalog import table
from postgres_es_cdc_spark.memo import register

SCALE = 10**12
ITERS = 3


_EDGE_CACHE: dict = register({})


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trade edges: distinct (customer, supplier) pairs that
    share an order line, both directions, with disjoint node ids
    (customer 2k, supplier 2k+1).

    Memoized per (session, corpus) as a lazily localCheckpointed frame:
    the orders⋈lineitem + distinct derivation is the expensive stage of
    every graph query AND loop-invariant inside each — at 100 TB this is
    the edge table you persist once (bucketed by src) and share across
    pagerank / BFS / triangles."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EDGE_CACHE.get(key)
    if hit is None:
        hit = _build_edges(spark, sf_dir).localCheckpoint(eager=False)
        _EDGE_CACHE[key] = hit
    return hit


def _build_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
         .select((F.col("o_custkey") * 2).alias("cust"),
                 (F.col("l_suppkey") * 2 + 1).alias("supp"))
         .distinct()
    )
    return (
        pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
             .unionAll(pairs.select(F.col("supp").alias("src"),
                                    F.col("cust").alias("dst")))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str,
                   iters: int = ITERS) -> DataFrame:
    """Fixed-point PageRank (damping 0.85), ``iters`` iterations.

    Returns (node, rank_q bigint, rank double): rank_q is the exact
    fixed-point value the oracle reproduces; rank is its descaled
    human-readable twin (one deterministic division)."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select("src").distinct().withColumnRenamed("src", "node")
    n_nodes = nodes.agg(F.count("*").alias("n"))

    # r0 = SCALE div N, uniformly.
    ranks = (nodes.crossJoin(F.broadcast(n_nodes))
                  .select("node", F.expr(f"{SCALE} div n").alias("r")))
    base = F.expr(f"{15 * SCALE} div (100 * n)")
    for _ in range(iters):
        contrib = (
            ranks.join(edges, ranks.node == edges.src)
                 .join(deg, "src")
                 .select(F.col("dst").alias("node"),
                         F.expr("r div deg").alias("c"))
                 .groupBy("node")
                 .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
                 .crossJoin(F.broadcast(n_nodes))
                 .select("node",
                         (base + F.expr("(17 * coalesce(s, 0)) div 20"))
                         .cast("long").alias("r"))
        )
    return ranks.select(
        "node", F.col("r").alias("rank_q"),
        (F.col("r").cast("double") / SCALE).alias("rank"))


def _iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         CAST((15000000000000 // (100 * (SELECT n FROM nn)))
              + (17 * COALESCE(c.s, 0)) // 20 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
    FROM {prev} r
    JOIN edges e ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON n.node = c.node
)"""


GRAPH_PAGERANK_SQL = f"""
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT cust AS src, supp AS dst FROM p
          UNION ALL SELECT supp AS src, cust AS dst FROM p),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({SCALE} // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes),
{",".join(_iter_sql(f"r{i}", f"r{i + 1}") for i in range(ITERS))}
SELECT node, r AS rank_q, CAST(r AS DOUBLE) / {SCALE} AS rank
FROM r{ITERS}
"""


_COPURCHASE_CACHE: dict = register({})


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges (u < v), session-memoized:
    the lineitem self-join + distinct is the expensive loop-invariant
    stage shared by triangle counts, the clustering coefficient, and
    the DOULION estimator (it dominated each query's isolated runtime
    before the memo — ~10s of a 13s sf1 run was edge derivation). At
    100 TB this is the co-purchase edge table you materialize once,
    bucketed by u."""
    key = (spark.sparkContext.applicationId, sf_dir, "copurchase")
    hit = _COPURCHASE_CACHE.get(key)
    if hit is None:
        l = table(spark, sf_dir, "lineitem")
        a = l.select("l_orderkey", F.col("l_partkey").alias("u"))
        b = l.select("l_orderkey", F.col("l_partkey").alias("v"))
        hit = (a.join(b, "l_orderkey")
                .filter(F.col("u") < F.col("v"))
                .select("u", "v").distinct()
                .localCheckpoint(eager=True))
        _COPURCHASE_CACHE[key] = hit
    return hit


def _copurchase_forward_tri(spark: SparkSession, sf_dir: str):
    """Shared triangle engine over the part co-purchase graph (parts
    sharing an order, via lineitem self-join): returns (deg, tcnt) —
    the per-node degree table and per-node triangle counts (nodes with
    at least one triangle).

    Algorithm: degree-oriented "forward" method in its ADJACENCY-ARRAY
    form — orient every edge from its lower-(degree, id) endpoint to
    the higher, build each node's oriented out-neighbor array, and for
    every oriented edge (u, v) the triangles through it are
    N+(u) ∩ N+(v). Orientation bounds out-degree by O(sqrt m), so total
    intersection work is the optimal O(m^1.5) — but unlike the wedge
    SELF-JOIN formulation, the O(m^1.5) wedge set is never materialized
    through a shuffle: the intersection runs inside whole-stage codegen
    on two array columns of one row (the round-6 common-neighbors
    lesson; the wedge-join draft of this measured 13.8x at 10x data —
    ~750M wedge rows through an exchange — vs ~2x for this form). Each
    triangle appears exactly once (at its oriented pivot edge).
    All-integer, so exact on any engine.

    Scale: shuffles are edge distinct, degree agg, adjacency groupBy,
    and two joins keyed by node that carry arrays bounded by O(sqrt m)
    elements (the orientation's guarantee — no unbounded collect_list).
    Every multi-consumer frame is eagerly checkpointed before fan-out
    (lazy persistence schedules the upstream once per branch).
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg, tcnt, _tri = _forward_tri(edges)
    return deg, tcnt


def _forward_tri(edges: DataFrame):
    """The forward-method core over any distinct (u < v) edge frame:
    returns (deg, tcnt, tri) — tri holds exactly one row per triangle.
    Shared by the exact queries and the DOULION edge-sampled estimator
    (which feeds it the sampled subgraph)."""
    deg = (edges.select(F.col("u").alias("node"))
                .unionAll(edges.select(F.col("v").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
                .localCheckpoint(eager=False))
    e = (edges
         .join(deg.select(F.col("node").alias("u"),
                          F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("node").alias("v"),
                          F.col("deg").alias("dv")), "v"))
    fwd = ((F.col("du") < F.col("dv"))
           | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))))
    ori = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    adj = (ori.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
              .localCheckpoint(eager=False))
    # dst may have no out-edges: left join + empty-array default.
    t = (ori.join(adj.select(F.col("src"), F.col("nbrs").alias("nu")),
                  "src")
            .join(adj.select(F.col("src").alias("dst"),
                             F.col("nbrs").alias("nv")), "dst", "left")
            .select("src", "dst",
                    F.array_intersect(
                        F.col("nu"),
                        F.coalesce(F.col("nv"), F.array())).alias("ws")))
    tri = t.select("src", "dst", F.explode("ws").alias("w"))
    tcnt = (tri.select(F.explode(F.array("src", "dst", "w")).alias("node"))
               .groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles")))
    return deg, tcnt, tri


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the part co-purchase graph.
    [EXT] — the reference has no graph surface. Engine and scale notes:
    _copurchase_forward_tri (shared with the clustering coefficient)."""
    _, tcnt = _copurchase_forward_tri(spark, sf_dir)
    return tcnt.select(F.col("node").alias("partkey"), "n_triangles")


GRAPH_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
), ori AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN dv.deg ELSE du.deg END AS ddst
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
), tri AS (
  SELECT e1.src AS s, e1.dst AS v1, e2.dst AS v2
  FROM ori e1
  JOIN ori e2 ON e1.src = e2.src
   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
  JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
SELECT node AS partkey, COUNT(*) AS n_triangles
FROM (SELECT s AS node FROM tri
      UNION ALL SELECT v1 AS node FROM tri
      UNION ALL SELECT v2 AS node FROM tri)
GROUP BY node
"""


DOULION_PNUM = 1
DOULION_PDEN = 4


def graph_triangle_estimate(spark: SparkSession, sf_dir: str,
                            pnum: int = DOULION_PNUM,
                            pden: int = DOULION_PDEN) -> DataFrame:
    """DOULION-style approximate GLOBAL triangle count (Tsourakakis et
    al., KDD'09) — the 100 TB answer where even the optimal exact
    O(m^1.5) is the bench's heaviest curve: sample each edge with
    probability p = pnum/pden, count triangles on the sampled subgraph
    with the SAME forward engine, scale by 1/p³. Work drops ~p²·m^1.5
    (the sampled graph has p·m edges) and the first pass is a map-side
    filter — the knob that keeps triangle analytics affordable as m
    grows 100×.

    DERANDOMIZED: the coin is a deterministic portable hash of the
    edge (h32(u || '_' || v) % pden < pnum), mirrored verbatim in the
    oracle CTE, so the sampled subgraph — and with it every output
    bit — is identical in both engines; no rand(), replays stable.

    Returns one row: sampled edge/triangle counts, est_triangles =
    t·(1/p)³ (exact integer), and the independent-triangle stderr
    sqrt(t·(s²−s)) with s = (1/p)³ — IEEE sqrt of an exact integer,
    correctly rounded identically everywhere (the full DOULION
    variance adds a shared-edge term whose computation costs as much
    as exact counting; the independent bound is the reported
    envelope). The exact row (graph_triangle_counts) is retained —
    this is the scale sibling, est ≈ p⁻³·Σ_sampled."""
    from postgres_es_cdc_spark.llm.text import h32

    if pden % pnum:
        raise ValueError("pnum must divide pden (integer 1/p)")
    edges = _copurchase_edges(spark, sf_dir)
    keep = (h32(F.concat_ws("_", F.col("u"), F.col("v"))) % pden) < pnum
    se = edges.filter(keep).localCheckpoint(eager=False)
    _deg, _tcnt, tri = _forward_tri(se)
    s = (pden // pnum) ** 3
    ne = se.agg(F.count(F.lit(1)).alias("n_edges_sampled"))
    nt = tri.agg(F.count(F.lit(1)).alias("n_tri_sampled"))
    # exact wedge count on the FULL graph is one cheap degree pass:
    # W = sum deg(deg-1)/2; transitivity = 3T/W, estimated with T_est.
    wedges = (edges.select(F.col("u").alias("node"))
                   .unionAll(edges.select(F.col("v").alias("node")))
                   .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
                   .agg(F.expr("sum((deg * (deg - 1)) div 2)")
                        .cast("long").alias("n_wedges")))
    return (ne.crossJoin(nt).crossJoin(wedges)
              .select("n_edges_sampled", "n_tri_sampled",
                      (F.col("n_tri_sampled") * s).alias("est_triangles"),
                      F.sqrt((F.col("n_tri_sampled") * (s * s - s))
                             .cast("double")).alias("stderr"),
                      "n_wedges",
                      (F.lit(3.0) * (F.col("n_tri_sampled") * s)
                       .cast("double")
                       / F.col("n_wedges").cast("double"))
                      .alias("transitivity_est")))


GRAPH_TRIANGLE_ESTIMATE_SQL = f"""
WITH pairs0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), pairs AS (
  SELECT u, v FROM pairs0
  WHERE ('0x' || substr(md5(CAST(u AS VARCHAR) || '_'
                            || CAST(v AS VARCHAR)), 1, 8))::BIGINT
        % {DOULION_PDEN} < {DOULION_PNUM}
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
), ori AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN dv.deg ELSE du.deg END AS ddst
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
), tri AS (
  SELECT e1.src AS s, e1.dst AS v1, e2.dst AS v2
  FROM ori e1
  JOIN ori e2 ON e1.src = e2.src
   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
  JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tri_sampled FROM tri),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_sampled FROM pairs),
wedges AS (
  SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
  FROM (SELECT node, COUNT(*) AS deg FROM (
          SELECT u AS node FROM pairs0
          UNION ALL SELECT v AS node FROM pairs0)
        GROUP BY node)
)
SELECT ne.n_edges_sampled, cnt.n_tri_sampled,
       CAST(cnt.n_tri_sampled * {(DOULION_PDEN // DOULION_PNUM) ** 3}
            AS BIGINT) AS est_triangles,
       SQRT(CAST(cnt.n_tri_sampled
            * {(DOULION_PDEN // DOULION_PNUM) ** 6
               - (DOULION_PDEN // DOULION_PNUM) ** 3}
            AS DOUBLE)) AS stderr,
       wedges.n_wedges,
       3.0 * CAST(cnt.n_tri_sampled
                  * {(DOULION_PDEN // DOULION_PNUM) ** 3} AS DOUBLE)
           / CAST(wedges.n_wedges AS DOUBLE) AS transitivity_est
FROM ne, cnt, wedges
"""


LOCAL_TRI_PNUM = 1
LOCAL_TRI_PDEN = 2


def graph_local_clustering_estimate(
        spark: SparkSession, sf_dir: str,
        pnum: int = LOCAL_TRI_PNUM,
        pden: int = LOCAL_TRI_PDEN) -> DataFrame:
    """Approximate PER-NODE triangle counts and local clustering
    coefficient via DOULION edge sampling — the 100× path for the LOCAL
    statistic, where graph_triangle_estimate only covers the global
    count and the exact engine's O(m^1.5) is the bench's heaviest graph
    curve. Sample edges with p = pnum/pden (derandomized hash coin,
    graph_triangle_estimate's discipline — the oracle CTE repeats the
    coin verbatim, so both engines count the IDENTICAL subgraph and
    every output bit matches), run the same forward engine on the
    sample, scale per-node counts by 1/p³. Intersection work drops
    ~p²·m^1.5; the only full-graph pass is the exact degree table (one
    map-side-combinable agg).

    p defaults to 1/2 (not the global estimator's 1/4): per-node
    counts are small, so the local statistic needs more sample mass
    per node for a useful point estimate — at p=1/2 the heavy
    intersection stage still runs at ~1/4 the exact cost.

    Guards: output covers every FULL-graph node with deg ≥ 2 (the
    denominator floor — cc undefined below it; sampled-zero nodes
    report 0, never NULL), and cc_est is clamped to [0, 1] with
    least() — a lucky node can sample more scaled triangles than its
    true wedge count, and a clamped coefficient keeps the estimate
    inside the statistic's range (the clamp is in the oracle too).

    Exactness: est_triangles is integer-scaled (t·(1/p)³ exact);
    cc_est is one int→double division + one least() against 1.0 —
    identical IEEE sequence in DuckDB. The exact row
    (graph_clustering_coefficient) is retained; this is its scale
    sibling."""
    from postgres_es_cdc_spark.llm.text import h32

    if pden % pnum:
        raise ValueError("pnum must divide pden (integer 1/p)")
    edges = _copurchase_edges(spark, sf_dir)
    keep = (h32(F.concat_ws("_", F.col("u"), F.col("v"))) % pden) < pnum
    se = edges.filter(keep).localCheckpoint(eager=False)
    _sdeg, stcnt, _tri = _forward_tri(se)
    deg = (edges.select(F.col("u").alias("node"))
                .unionAll(edges.select(F.col("v").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    s = (pden // pnum) ** 3
    out = (deg.filter(F.col("deg") >= 2)
              .join(stcnt, "node", "left")
              .select(
                  F.col("node").alias("partkey"), "deg",
                  F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
                   .alias("n_tri_sampled")))
    est = (F.col("n_tri_sampled") * s).cast("long")
    cc = F.least(
        F.lit(1.0),
        (est * 2).cast("double")
        / (F.col("deg") * (F.col("deg") - 1)).cast("double"))
    return (out.withColumn("est_triangles", est)
               .withColumn("cc_est", cc))


GRAPH_LOCAL_CLUSTERING_EST_SQL = f"""
WITH pairs0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), pairs AS (
  SELECT u, v FROM pairs0
  WHERE ('0x' || substr(md5(CAST(u AS VARCHAR) || '_'
                            || CAST(v AS VARCHAR)), 1, 8))::BIGINT
        % {LOCAL_TRI_PDEN} < {LOCAL_TRI_PNUM}
), sdeg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
), ori AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN dv.deg ELSE du.deg END AS ddst
  FROM pairs
  JOIN sdeg du ON du.node = pairs.u
  JOIN sdeg dv ON dv.node = pairs.v
), tri AS (
  SELECT e1.src AS s, e1.dst AS v1, e2.dst AS v2
  FROM ori e1
  JOIN ori e2 ON e1.src = e2.src
   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
  JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), stcnt AS (
  SELECT node, COUNT(*) AS n_tri_sampled
  FROM (SELECT s AS node FROM tri
        UNION ALL SELECT v1 AS node FROM tri
        UNION ALL SELECT v2 AS node FROM tri)
  GROUP BY node
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs0 UNION ALL SELECT v AS node FROM pairs0)
  GROUP BY node
)
SELECT deg.node AS partkey, deg.deg,
       CAST(COALESCE(stcnt.n_tri_sampled, 0) AS BIGINT) AS n_tri_sampled,
       CAST(COALESCE(stcnt.n_tri_sampled, 0)
            * {(LOCAL_TRI_PDEN // LOCAL_TRI_PNUM) ** 3} AS BIGINT)
         AS est_triangles,
       LEAST(1.0,
             CAST(COALESCE(stcnt.n_tri_sampled, 0)
                  * {(LOCAL_TRI_PDEN // LOCAL_TRI_PNUM) ** 3}
                  * 2 AS DOUBLE)
             / CAST(deg.deg * (deg.deg - 1) AS DOUBLE)) AS cc_est
FROM deg LEFT JOIN stcnt ON stcnt.node = deg.node
WHERE deg.deg >= 2
"""


BFS_ITERS = 4


def graph_bfs_distances(spark: SparkSession, sf_dir: str,
                        iters: int = BFS_ITERS) -> DataFrame:
    """Bounded-hop BFS distances from a seed set (customers 1-4) over
    the trade graph — the reachability/shortest-path member of the
    iterative family (pagerank = value propagation, triangles = local
    counting, BFS = frontier expansion).

    Formulation is frontier-only: each iteration expands ONLY the nodes
    first reached in the previous round (one join keyed by src + a
    distinct on dst + an anti-join against the settled set), so the join
    input shrinks as the search saturates instead of re-relaxing every
    settled node. With unit edge weights a node's distance never
    improves after it is first set — dist(v) is exactly the iteration
    that discovers v — so this is result-identical to the relax-all
    formulation the unrolled DuckDB twin expresses, on any hop bound.
    All-integer, bit-identical cross-engine. Unreached nodes stay
    absent.

    Scale: relax-all joins the FULL distance table to the edges every
    round (input doubles as reachability saturates — the 100×-scale
    killer); frontier-only joins |frontier_i| rows, which for a
    saturating search decays to zero. Each round's new layer (one short
    row per newly reached node) is locally checkpointed so the final
    union has flat, driver-free lineage.
    """
    # _edges is memoized + localCheckpointed (see there): iterations scan
    # materialized blocks instead of re-deriving orders⋈lineitem.
    edges = _edges(spark, sf_dir)
    # seed: customer nodes 2k for custkey in 1..4
    dist = (table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < 5)
            .select((F.col("c_custkey") * 2).alias("node"),
                    F.lit(0).cast("long").alias("dist")))
    frontier = dist.select("node")
    seen = frontier
    settled = [dist.localCheckpoint(eager=False)]
    for i in range(iters):
        reached = (frontier.join(edges, frontier.node == edges.src)
                           .select(F.col("dst").alias("node"))
                           .distinct())
        new = (reached.join(seen, "node", "left_anti")
                      .select("node",
                              F.lit(i + 1).cast("long").alias("dist"))
                      .localCheckpoint(eager=False))
        settled.append(new)
        frontier = new.select("node")
        seen = seen.unionByName(frontier)
    out = settled[0]
    for layer in settled[1:]:
        out = out.unionByName(layer)
    return out


def _bfs_iter_sql(prev: str, out: str) -> str:
    return f""", {out} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM {prev} d JOIN edges e ON e.src = d.node
  ) GROUP BY node
)"""


GRAPH_BFS_SQL = ("""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT cust AS src, supp AS dst FROM pairs
  UNION ALL
  SELECT supp AS src, cust AS dst FROM pairs
), d0 AS (
  SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
  FROM customer WHERE c_custkey < 5
)"""
    + "".join(_bfs_iter_sql(f"d{i}", f"d{i+1}") for i in range(BFS_ITERS))
    + f"\nSELECT node, dist FROM d{BFS_ITERS}")


CC_CHAIN = 50
CC_ROUNDS = 7


def _chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial CC input: pure chains of ~CC_CHAIN consecutive
    customer keys (k -> k+1 within each key-block). Long paths are the
    worst case for naive label propagation — min-label moves ONE hop
    per round, so chains need O(diameter) rounds; the pointer-doubling
    operator below needs O(log diameter)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    nxt = c.select((F.col("c_custkey")).alias("k2"))
    e = (c.join(nxt, F.col("c_custkey") + 1 == F.col("k2"))
          .filter(F.expr(f"c_custkey div {CC_CHAIN}")
                  == F.expr(f"(c_custkey + 1) div {CC_CHAIN}"))
          .select(F.col("c_custkey").alias("src"), F.col("k2").alias("dst")))
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def graph_connected_components(spark: SparkSession, sf_dir: str,
                               rounds: int = CC_ROUNDS) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    doubling: each round takes the min of (own label, the label OF the
    label — one extra join on label-as-node — and neighbor labels).
    Reachable-min distance follows D(r+1) = max(2*D(r), D(r)+1) = 2^(r-1)
    (the jump reads the SAME round's labels, so it doubles rather than
    doubles-plus-one), so 7 rounds cover diameter 64 where plain
    propagation covers 7 — the log-round shortcut (Kiveris et al.'s
    star-contraction family) that makes CC on path-shaped graphs
    feasible at 100 TB. docs_dedup_clusters uses
    plain propagation because LSH near-dup clusters are shallow; this
    operator is the deep-graph variant.

    Per round: one join keyed by label (the jump), one edge join + min
    aggregate (the hop), and a LAZY localCheckpoint that truncates the
    logical plan per round while deferring materialization
    (persist-on-first-compute) to the final action — the plan-side cut a
    Pregel barrier would make, without its per-round blocking driver
    job. All arithmetic is integer min — bit-exact against the
    unrolled-CTE oracle by construction.
    """
    edges = _chain_edges(spark, sf_dir).localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
                  .unionByName(
                      table(spark, sf_dir, "customer")
                      .select(F.col("c_custkey").alias("node")))
                  .distinct())
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        jump = labels.select(F.col("node").alias("label"),
                             F.col("label").alias("jlabel"))
        neigh = (edges.join(labels, edges.dst == labels.node)
                      .groupBy(F.col("src").alias("node"))
                      .agg(F.min("label").alias("nlabel")))
        labels = (labels.join(jump, "label")
                        .join(neigh, "node", "left")
                        .select("node",
                                F.least(F.col("label"), F.col("jlabel"),
                                        F.coalesce("nlabel", F.col("label")))
                                .alias("label")))
        labels = labels.localCheckpoint(eager=False)
    return (labels.groupBy(F.col("label").alias("component"))
                  .agg(F.count(F.lit(1)).alias("n_nodes"),
                       F.min("node").alias("min_node"),
                       F.max("node").alias("max_node")))


def _cc_iter_sql(i: int) -> str:
    prev = f"l{i - 1}"
    # AS MATERIALIZED: DuckDB inlines plain CTEs, and each round
    # references the previous one THREE times (self, jump, neighbor) —
    # inlining makes the unrolled chain exponential (3^rounds scans).
    return f"""l{i} AS MATERIALIZED (
  SELECT l.node,
         LEAST(l.label, MAX(j.label),
               COALESCE(MIN(r.label), l.label)) AS label
  FROM {prev} l
  JOIN {prev} j ON j.node = l.label
  LEFT JOIN cedges e ON e.src = l.node
  LEFT JOIN {prev} r ON r.node = e.dst
  GROUP BY l.node, l.label
)"""


GRAPH_CC_SQL = (f"""
WITH chain AS (
  SELECT c.c_custkey AS src, c.c_custkey + 1 AS dst
  FROM customer c JOIN customer c2 ON c2.c_custkey = c.c_custkey + 1
  WHERE c.c_custkey // {CC_CHAIN} = (c.c_custkey + 1) // {CC_CHAIN}
),
cedges AS MATERIALIZED (SELECT src, dst FROM chain
           UNION ALL SELECT dst AS src, src AS dst FROM chain),
nodes AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM cedges
  UNION ALL SELECT c_custkey AS node FROM customer)),
l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
"""
    + ",\n".join(_cc_iter_sql(i) for i in range(1, CC_ROUNDS + 1)) + f"""
SELECT label AS component, COUNT(*) AS n_nodes,
       MIN(node) AS min_node, MAX(node) AS max_node
FROM l{CC_ROUNDS} GROUP BY label
""")


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the trade graph, split by node
    side (customer/supplier) — the first plot of any graph pipeline
    (power-law check, hub detection, partitioner sizing). Bucket =
    integer bit-length of the degree (length(bin(deg)) — libm-free).

    Reuses the memoized edge table; one partial-aggregable count by
    node plus one by bucket — output is O(log max_degree)."""
    deg = (_edges(spark, sf_dir)
           .groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    side = F.when(F.col("src") % 2 == 0,
                  F.lit("customer")).otherwise(F.lit("supplier"))
    return (deg.select(side.alias("side"),
                       F.expr("CAST(length(bin(deg)) AS INT)")
                        .alias("bucket"),
                       "deg")
               .groupBy("side", "bucket")
               .agg(F.count(F.lit(1)).alias("n_nodes"),
                    F.min("deg").alias("min_deg"),
                    F.max("deg").alias("max_deg")))


GRAPH_DEGREE_DIST_SQL = """
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT cust AS src, supp AS dst FROM p
          UNION ALL SELECT supp AS src, cust AS dst FROM p),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
       CAST(length(bin(deg)) AS INT) AS bucket,
       COUNT(*) AS n_nodes,
       CAST(MIN(deg) AS BIGINT) AS min_deg,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM deg
GROUP BY 1, 2
"""


KCORE_K = 3
KCORE_PEELS = 3


def graph_kcore_peel(spark: SparkSession, sf_dir: str,
                     k: int = KCORE_K, peels: int = KCORE_PEELS) -> DataFrame:
    """Bounded k-core peeling: ``peels`` rounds of "drop every node
    with degree < k, recompute degrees" over the trade graph — the
    standard dense-subgraph extraction (community cores, spam rings).
    A fixed peel count instead of peel-to-fixpoint keeps the oracle an
    exact unrolled CTE chain (same discipline as BFS/pagerank); nodes
    still shedding degree at round `peels` show in_core_after_peels
    with core_degree < k never True.

    Scale shape: each peel is one partial-aggregable degree count plus
    two semi-join-shaped filters of the edge list — O(peels) passes
    over a monotonically SHRINKING edge set, reading the memoized edge
    materialization once."""
    edges = _edges(spark, sf_dir)
    surv = edges
    for _ in range(peels):
        keep = (surv.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                    .filter(F.col("deg") >= k).select("src"))
        surv = (surv.join(keep, "src")
                    .join(keep.withColumnRenamed("src", "dst"), "dst")
                    .select("src", "dst"))
    fd = surv.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select("src").distinct()
    cd = F.coalesce(F.col("deg"), F.lit(0)).cast("long")
    return (nodes.join(fd, "src", "left")
                 .select(F.col("src").alias("node"),
                         cd.alias("core_degree"),
                         (cd >= k).alias("in_core_after_peels")))


def _kcore_iter_sql(i: int, k: int) -> str:
    return f"""
k{i} AS (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM e{i - 1}
                          GROUP BY src) WHERE deg >= {k}),
e{i} AS (SELECT e.src, e.dst FROM e{i - 1} e
         JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src)"""


GRAPH_KCORE_SQL = (f"""
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e0 AS (SELECT cust AS src, supp AS dst FROM p
       UNION ALL SELECT supp AS src, cust AS dst FROM p),"""
    + ",".join(_kcore_iter_sql(i, KCORE_K)
               for i in range(1, KCORE_PEELS + 1))
    + f""",
fd AS (SELECT src, COUNT(*) AS deg FROM e{KCORE_PEELS} GROUP BY src),
nodes AS (SELECT DISTINCT src FROM e0)
SELECT n.src AS node,
       CAST(COALESCE(fd.deg, 0) AS BIGINT) AS core_degree,
       COALESCE(fd.deg, 0) >= {KCORE_K} AS in_core_after_peels
FROM nodes n LEFT JOIN fd ON n.src = fd.src
""")


def graph_kcore_fixpoint(spark: SparkSession, sf_dir: str,
                         k: int = KCORE_K) -> DataFrame:
    """k-core to FIXPOINT: peel "drop every node with degree < k,
    recompute" until the edge set stops changing — the answer a real
    user wants from k-core (graph_kcore_peel keeps the bounded-round
    variant for the unrolled-oracle discipline; this row carries the
    convergence-detected one, oracle'd by a recursive CTE).

    Convergence detection: the peel step only ever removes nodes, so
    "no node below k" IS the fixpoint — detected from the |V|-sized
    degree table BEFORE the round's edge filter, so the final
    round runs the degree count only, never a wasted join. Rounds are
    O(peel depth) <= O(|V|); on power-law trade graphs the depth is
    small (~4 here).

    Scale shape — INCREMENTAL degree maintenance (the real fixpoint
    pattern at 35M+ edges): the full |E|-shuffle degree aggregation
    runs exactly ONCE; every subsequent round maintains the |V|-sized
    degree table by SUBTRACTING the removed endpoints' counts —
    dec(v) = #edges (v → just-removed u), an aggregate whose shuffle
    is O(edges touching the removed set), computed as one map-side
    broadcast-hash probe over the once-materialized base edges (no
    filter stack, no edge rewrite: an edge (v,u) is live at round
    start iff both endpoints are, and u ∈ removed_r certifies u was —
    so the base table plus the current deg table's alive-node inner
    join is sufficient, with no cumulative removed-set bookkeeping).
    The maintained degree IS the final core degree (exact by
    induction; the recursive-CTE oracle re-proves it per run). On a
    cluster, bucket the base edges by dst and the probe prunes to the
    removed keys' buckets. Earlier shape (re-aggregate surviving |E|
    per round over stacked broadcast filters) measured 5.2x per 3x
    decade at sf3; this one does O(|E|) shuffle work once."""
    base = _edges(spark, sf_dir)  # session-memoized, already checkpointed
    deg = (base.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
               .localCheckpoint(eager=False))
    while True:
        removed = deg.filter(F.col("deg") < k).select("src")
        if removed.limit(1).count() == 0:
            break
        dec = (base.join(F.broadcast(
                       removed.withColumnRenamed("src", "dst")), "dst")
                   .groupBy("src").agg(F.count(F.lit(1)).alias("dec")))
        deg = (deg.join(F.broadcast(removed), "src", "left_anti")
                  .join(dec, "src", "left")
                  .select("src", (F.col("deg")
                                  - F.coalesce("dec", F.lit(0)))
                          .alias("deg"))
                  .localCheckpoint(eager=False))
    nodes = base.select("src").distinct()
    cd = F.coalesce(F.col("deg"), F.lit(0)).cast("long")
    return (nodes.join(deg, "src", "left")
                 .select(F.col("src").alias("node"),
                         cd.alias("core_degree"),
                         (cd >= k).alias("in_core")))


# Recursive-CTE oracle: the working table of each iteration is the live
# edge set; the step keeps only edges whose BOTH endpoints have degree
# >= k and fires only while some node is still below k (so iterations
# strictly shrink and the recursion terminates). The max-it rows are
# the last materialized set; one more peel applied OUTSIDE the
# recursion (kfin/fin) covers the everything-peeled ending, where the
# recursion stops by producing zero rows rather than by the guard.
GRAPH_KCORE_FIXPOINT_SQL = f"""
WITH RECURSIVE p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e0 AS (SELECT cust AS src, supp AS dst FROM p
       UNION ALL SELECT supp AS src, cust AS dst FROM p),
peel(src, dst, it) AS (
  SELECT src, dst, 0 FROM e0
  UNION ALL
  SELECT e.src, e.dst, e.it + 1
  FROM peel e
  JOIN (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM peel GROUP BY src)
        WHERE deg >= {KCORE_K}) a ON e.src = a.src
  JOIN (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM peel GROUP BY src)
        WHERE deg >= {KCORE_K}) b ON e.dst = b.src
  WHERE EXISTS (SELECT 1 FROM (SELECT src, COUNT(*) AS deg FROM peel
                               GROUP BY src) WHERE deg < {KCORE_K})
),
last AS (SELECT src, dst FROM peel WHERE it = (SELECT MAX(it) FROM peel)),
kfin AS (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM last GROUP BY src)
         WHERE deg >= {KCORE_K}),
fin AS (SELECT e.src, e.dst FROM last e
        JOIN kfin a ON e.src = a.src JOIN kfin b ON e.dst = b.src),
fd AS (SELECT src, COUNT(*) AS deg FROM fin GROUP BY src),
nodes AS (SELECT DISTINCT src FROM e0)
SELECT n.src AS node,
       CAST(COALESCE(fd.deg, 0) AS BIGINT) AS core_degree,
       COALESCE(fd.deg, 0) >= {KCORE_K} AS in_core
FROM nodes n LEFT JOIN fd ON n.src = fd.src
"""


CN_TOP = 20
CN_BUCKET_CAP = 1000


def _mh(a: int, b: int):
    """Minhash permutation as a 1-arg transform lambda (factory closure:
    default-arg capture would change the lambda's arity and flip
    F.transform into its (element, index) form — DEVNOTES rule 8)."""
    from postgres_es_cdc_spark.llm.dedup import MINHASH_P
    return lambda s: (s * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def graph_common_neighbors_topk(spark: SparkSession, sf_dir: str,
                                top: int = CN_TOP,
                                cap: int = CN_BUCKET_CAP) -> DataFrame:
    """Common-neighbor link prediction on the bipartite trade graph:
    the customer pairs sharing the most suppliers — the triadic-closure
    score behind "customers like you also buy from" recommendations and
    collusion screening.

    Two-stage design, because the graph is DENSE on the supplier side
    (every supplier serves ~590 customers at every sf — the sf1 sweep
    measured the naive supplier-keyed pair join at 3.4e9 pair rows /
    518 s, Σ deg² with no rare keys for a cap to exploit):

      1. CANDIDATES by MinHash-LSH over each customer's supplier SET —
         the dedup arsenal's banding (same permutation constants,
         LSH_BANDS r=2 layout, PAIR_BUCKET_CAP-capped buckets) applied
         to adjacency lists. Work is O(customers · perms · deg) + capped
         bucket pairing — linear in edges, never Σ deg².
      2. EXACT verify on candidates only: n_common = |N(a) ∩ N(b)| via
         array_intersect of the two (sorted, per-customer-capped)
         adjacency arrays — customer degree is the SPARSE side (~40),
         so each verify touches ~80 ints.

    The contract is therefore "top-k by exact common-neighbor count
    AMONG LSH candidates" (recall 1-(1-J²)⁴ per pair at Jaccard J —
    high-overlap pairs are found with high probability, and the top
    pairs are exactly the high-overlap ones). The oracle reproduces the
    identical signatures, banding, caps, and intersection counts, so
    the result is bit-exact. Ties: (cust_a, cust_b) asc."""
    from postgres_es_cdc_spark.llm.dedup import (LSH_BANDS, MINHASH_PERMS,
                                                 _cap_buckets)

    ce = _edges(spark, sf_dir).filter(F.col("src") % 2 == 0)  # cust->supp
    # bound the per-customer adjacency list BEFORE collecting it
    ce = _cap_buckets(ce, ["src"], "dst", cap)
    # Checkpointed: adj feeds THREE plan branches (signatures + both
    # verify sides); without it each branch recomputes the edge window
    # + collect — the compacted adjacency is the persistence point
    # (same reasoning as triangle counting's cached orientation).
    adj = (ce.groupBy("src")
             .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
             .localCheckpoint(eager=False))
    sig_cols = [
        F.array_min(F.transform(F.col("nbrs"), _mh(a, b))).alias(f"sig{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)]
    sigs = adj.select("src", *sig_cols)
    band_structs = F.array(*[
        F.struct(F.lit(bi).alias("band_idx"),
                 F.col(f"sig{i}").alias("k1"),
                 F.col(f"sig{j}").alias("k2"))
        for bi, (i, j) in enumerate(LSH_BANDS)])
    bands = (sigs.select("src", F.explode(band_structs).alias("b"))
                 .select("src", "b.band_idx", "b.k1", "b.k2"))
    bands = _cap_buckets(bands, ["band_idx", "k1", "k2"], "src", cap)
    l = bands.select(F.col("src").alias("cust_a"), "band_idx", "k1", "k2")
    r = bands.select(F.col("src").alias("cust_b"), "band_idx", "k1", "k2")
    cand = (l.join(r, ["band_idx", "k1", "k2"])
             .filter(F.col("cust_a") < F.col("cust_b"))
             .select("cust_a", "cust_b").distinct())
    xa = adj.select(F.col("src").alias("cust_a"),
                    F.col("nbrs").alias("na"))
    xb = adj.select(F.col("src").alias("cust_b"),
                    F.col("nbrs").alias("nb"))
    scored = (cand.join(xa, "cust_a").join(xb, "cust_b")
                  .select("cust_a", "cust_b",
                          F.size(F.array_intersect("na", "nb"))
                           .cast("long").alias("n_common")))
    topk = scored.orderBy(F.desc("n_common"), F.asc("cust_a"),
                          F.asc("cust_b")).limit(top)
    w = Window.orderBy(F.desc("n_common"), F.asc("cust_a"),
                       F.asc("cust_b"))
    return (topk.withColumn("rank", F.row_number().over(w))
                .select("rank", "cust_a", "cust_b", "n_common"))


def _cn_sql() -> str:
    from postgres_es_cdc_spark.llm.dedup import (LSH_BANDS, MINHASH_P,
                                                 MINHASH_PERMS)
    sig_sel = ",\n".join(
        f"       list_min(list_transform(nbrs, s -> (s*{a} + {b}) % "
        f"{MINHASH_P})) AS sig{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS))
    band_sel = "\n  UNION ALL\n".join(
        f"  SELECT cust, {bi} AS band_idx, sig{i} AS k1, sig{j} AS k2 "
        f"FROM sigs"
        for bi, (i, j) in enumerate(LSH_BANDS))
    return f"""
WITH p AS (
  SELECT DISTINCT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
pc AS (
  SELECT cust, supp
  FROM (SELECT cust, supp,
               ROW_NUMBER() OVER (PARTITION BY cust ORDER BY supp) AS rn
        FROM p)
  WHERE rn <= {{cap}}
),
adj AS (SELECT cust, list_sort(list(supp)) AS nbrs FROM pc GROUP BY cust),
sigs AS (
  SELECT cust, nbrs,
{sig_sel}
  FROM adj
),
bands AS (
{band_sel}
),
bcap AS (
  SELECT cust, band_idx, k1, k2
  FROM (SELECT cust, band_idx, k1, k2,
               ROW_NUMBER() OVER (PARTITION BY band_idx, k1, k2
                                  ORDER BY cust) AS rn
        FROM bands)
  WHERE rn <= {{cap}}
),
cand AS (
  SELECT DISTINCT a.cust AS cust_a, b.cust AS cust_b
  FROM bcap a JOIN bcap b
    ON a.band_idx = b.band_idx AND a.k1 = b.k1 AND a.k2 = b.k2
   AND a.cust < b.cust
),
scored AS (
  SELECT cust_a, cust_b,
         CAST(len(list_intersect(x.nbrs, y.nbrs)) AS BIGINT) AS n_common
  FROM cand
  JOIN adj x ON x.cust = cand.cust_a
  JOIN adj y ON y.cust = cand.cust_b
)
SELECT ROW_NUMBER() OVER (ORDER BY n_common DESC, cust_a ASC, cust_b ASC)
         AS rank,
       cust_a, cust_b, n_common
FROM scored
ORDER BY n_common DESC, cust_a ASC, cust_b ASC
LIMIT {{top}}
"""


GRAPH_COMMON_NEIGHBORS_SQL = _cn_sql().format(cap=CN_BUCKET_CAP,
                                              top=CN_TOP)


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the part co-purchase
    graph: cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2 — the
    standard local-density diagnostic (community structure, link-spam
    detection) on top of the triangle engine. [EXT] — the reference has
    no graph surface.

    Shares the forward triangle engine with graph_triangle_counts
    (_copurchase_forward_tri: adjacency-array intersections, O(m^1.5)
    work with no wedge-set shuffle); nodes with zero triangles are kept
    via a left join against the degree table, so the output covers
    EVERY node of deg ≥ 2.

    Exactness: T and deg are integers; the coefficient is one
    int→double division (2·T ≤ 2^32, deg·(deg−1) ≤ 2^40 — both exact
    doubles), the same single-op IEEE sequence in DuckDB.

    Scale: the triangle engine dominates (see its docstring; the
    wedge-join draft of this query measured 49.8s at sf1 vs ~2x
    expected); the closing left join is keyed by node — broadcast-able
    whenever the node set is, partitioned otherwise.
    """
    deg, tcnt = _copurchase_forward_tri(spark, sf_dir)
    out = (deg.filter(F.col("deg") >= 2)
              .join(tcnt, "node", "left")
              .select(
                  F.col("node").alias("partkey"),
                  "deg",
                  F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
                   .alias("n_triangles")))
    cc = ((F.col("n_triangles") * 2).cast("double")
          / (F.col("deg") * (F.col("deg") - 1)).cast("double"))
    return out.withColumn("clustering_coeff", cc)


GRAPH_CLUSTERING_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
  GROUP BY node
), ori AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN u ELSE v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN v ELSE u END AS dst,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
              THEN dv.deg ELSE du.deg END AS ddst
  FROM pairs
  JOIN deg du ON du.node = pairs.u
  JOIN deg dv ON dv.node = pairs.v
), tri AS (
  SELECT e1.src AS s, e1.dst AS v1, e2.dst AS v2
  FROM ori e1
  JOIN ori e2 ON e1.src = e2.src
   AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
  JOIN ori e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), tcnt AS (
  SELECT node, COUNT(*) AS n_triangles
  FROM (SELECT s AS node FROM tri
        UNION ALL SELECT v1 AS node FROM tri
        UNION ALL SELECT v2 AS node FROM tri)
  GROUP BY node
)
SELECT deg.node AS partkey, deg.deg,
       CAST(COALESCE(tcnt.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(COALESCE(tcnt.n_triangles, 0) * 2 AS DOUBLE)
       / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS clustering_coeff
FROM deg LEFT JOIN tcnt ON tcnt.node = deg.node
WHERE deg.deg >= 2
"""
