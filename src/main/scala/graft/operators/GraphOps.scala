package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.sources.Tables

/** Graph analytics over pair lists — the layer on top of the near-dup
  * graph that connected components ([[DedupOps.clusterPairs]]) started:
  * centrality ranks WITHIN the duplicate neighborhoods, answering "which
  * document is the hub of this near-dup cluster" (the doc every variant
  * points at — a better canonical pick than min-id when quality signals
  * tie, and the shape web-graph dedup uses at corpus scale).
  */
object GraphOps {

  /** Rank quantization grid: integer ranks make every iteration an exact,
    * order-independent sum — the whitening/LR determinism discipline
    * applied to power iteration. Initial rank = Q per node; mass leaks
    * only through floor (documented, bounded by 1 per edge per iter).
    */
  final val Q = 1000000000L

  /** Deterministic PageRank over an UNDIRECTED pair list (d1, d2), damping
    * 0.85, `iters` fixed power-iteration steps. Every step is ONE shuffle
    * join (ranks ⋈ edges on the source node) + ONE aggregation by target —
    * the canonical distributed PR plan; per-iteration localCheckpoint cuts
    * the lineage exactly like the CC loop. All arithmetic is int64
    * (contribution = floor(85·r / (100·deg))), so the fixed ranks are
    * bit-identical under ANY partitioning (spec-pinned).
    */
  def pageRank(pairs: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = pairs.select(col("d1").as("u"), col("d2").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist(lvl)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "u")
      .select(col("u"), col("v"), col("deg")).persist(lvl)
    val nodes = deg.select(col("u").as("id")).persist(lvl)
    val base = Q * 15L / 100L
    var ranks = nodes.select(col("id"), lit(Q).as("r")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contrib = withDeg
        .join(ranks, col("u") === col("id"))
        .select(col("v"),
          // integer div, not `/` (which is a double in Spark): the floor
          // keeps every contribution exact int64
          expr("(r * 85L) div (deg * 100L)").as("c"))
        .groupBy("v").agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib, col("id") === col("v"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    edges.unpersist(); withDeg.unpersist(); nodes.unpersist()
    ranks
  }

  /** Hub ranking of the near-dup graph: PR over the exact Jaccard pairs,
    * reported per cluster so the rank is readable (rows-only gate — the
    * power iteration is not SQL-expressible; invariants + partition
    * independence are spec-pinned in `GraphSpec`).
    */
  def dupRank(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.jaccardPairsOn(Tables.t(s, dir, "documents"))
      .select("d1", "d2").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ranks = pageRank(pairs)
      val clusters = DedupOps.clusterPairs(pairs).select("doc_id", "cluster_id")
      ranks.join(clusters, col("id") === col("doc_id"))
        .select(col("cluster_id"), col("doc_id"), col("r").as("rank_q"))
        .orderBy(col("cluster_id").asc, col("rank_q").desc, col("doc_id").asc)
    } finally pairs.unpersist()
  }

  /** Triangle enumeration over the near-dup graph — the graph-density
    * signal cluster auditing needs (a triangle means three documents that
    * all pairwise near-duplicate: a tight clique seed, vs a star which is
    * one hub with unrelated satellites; template-generated spam shows up
    * as triangle-dense neighborhoods). The classic oriented-edge-list
    * plan: edges already arrive as a < b from the Jaccard pair builder,
    * so each triangle {a<b<c} is produced EXACTLY once by joining
    * (a,b)⋈(b,c) on the shared middle vertex and closing with (a,c) —
    * no permutation dedup pass. Two shuffle joins on vertex ids over the
    * (df-capped, so bounded-density) pair list; wedge fan-out per vertex
    * is deg², the published cost of any exact triangle count — the
    * hot-bucket/df caps upstream are precisely what bound deg here.
    * All-integer output, hash-exact gated.
    */
  def dupTriangles(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    trianglesOn(DedupOps.jaccardPairsOn(Tables.t(s, dir, "documents")))

  /** The triangle core over any oriented (d1 < d2) pair list — factored
    * so the Stress harness can drive it on planted clone corpora.
    */
  def trianglesOn(pairs: DataFrame): DataFrame = {
    val e = pairs
      .select("d1", "d2").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val wedges = e.select(col("d1").as("a"), col("d2").as("b"))
        .join(e.select(col("d1").as("b"), col("d2").as("c")), "b")
      val tri = wedges.join(
        e.select(col("d1").as("a"), col("d2").as("c")), Seq("a", "c"))
      // materialize before unpersist so the persisted edges back all three scans
      tri.select("a", "b", "c").orderBy("a", "b", "c").localCheckpoint(true)
    } finally e.unpersist()
  }

  /** One unrolled power-iteration step: contributions by target, then the
    * teleport base + in-mass. `SUM` over BIGINT widens to HUGEINT in
    * DuckDB, so each round casts back — every value is exact int64 by the
    * same floor-division argument as the Spark side.
    */
  private def prRound(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS (SELECT e.v AS id, SUM((p.r * 85) // (e.deg * 100)) AS m
       |        FROM dege e JOIN $prev p ON p.id = e.u GROUP BY e.v),
       |r$i AS (SELECT n.id, CAST(${Q * 15L / 100L} + COALESCE(c.m, 0) AS BIGINT) AS r
       |        FROM nodes n LEFT JOIN c$i c USING (id))""".stripMargin
  }

  /** The integer power iteration IS SQL-expressible once the fixed
    * iteration count is unrolled: 10 chained CTE rounds of the exact
    * same int64 arithmetic ((r*85) // (deg*100), teleport base 0.15·Q),
    * plus the recursive-CTE cluster labels the dup_clusters oracle
    * already uses. Bit-equality holds because every op is integer.
    */
  val dupRankOracle: String =
    s"""WITH RECURSIVE ${DedupOps.sqlCappedPairs},
       |prs AS (SELECT d1, d2 FROM jp),
       |edges AS (SELECT d1 AS u, d2 AS v FROM prs UNION SELECT d2, d1 FROM prs),
       |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u),
       |dege AS (SELECT e.u, e.v, d.deg FROM edges e JOIN deg d USING (u)),
       |nodes AS (SELECT DISTINCT u AS id FROM edges),
       |r0 AS (SELECT id, CAST($Q AS BIGINT) AS r FROM nodes),
       |${(1 to 10).map(prRound).mkString(",\n")},
       |reach AS (
       |  SELECT id, id AS rt FROM nodes
       |  UNION
       |  SELECT e.u AS id, r.rt FROM edges e JOIN reach r ON r.id = e.v),
       |clusters AS (SELECT id AS doc_id, MIN(rt) AS cluster_id FROM reach GROUP BY id)
       |SELECT cl.cluster_id, cl.doc_id, rk.r AS rank_q
       |FROM r10 rk JOIN clusters cl ON cl.doc_id = rk.id
       |ORDER BY cluster_id ASC, rank_q DESC, doc_id ASC""".stripMargin

  val dupTrianglesOracle: String =
    s"""WITH ${DedupOps.sqlCappedPairs},
       |e AS (SELECT d1, d2 FROM jp),
       |tri AS (
       |  SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.d1 = e1.d2
       |  JOIN e e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2)
       |SELECT a, b, c FROM tri ORDER BY a, b, c""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("doc_dup_rank", dupRank, Some(dupRankOracle)),
    QueryDef("doc_dup_triangles", dupTriangles, Some(dupTrianglesOracle))
  )
}
