package graft.catalog

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Graph analytics over relations — link analysis re-expressed as
  * iterated joins + aggregations, the shape GraphX/Pregel lowers to
  * anyway. The engine-level point: each iteration is ONE shuffle on the
  * edge key (contributions group by destination), state is a (node,
  * rank) table, and lineage is cut per round — exactly the loop that
  * scales to billions of edges.
  */
object Graph {

  private val Iters = 5

  // PageRank over the customer↔supplier bipartite trade graph (an edge
  // per distinct (o_custkey, l_suppkey) pair, both directions). Ranks
  // are FIXED-POINT integers (micro-units): every transfer is integer
  // division (r div deg), every damped update is integer arithmetic —
  // a float PageRank's partition-order-dependent double sums can never
  // hash-match across engines, integer fixed-point is bit-exact by
  // construction and still converges like the real thing (the
  // truncation loses < 1 micro-unit per edge per round).
  //
  // Node ids: customer c → 2c, supplier s → 2s+1 (disjoint ranges).
  val pagerank: QueryDef = {
    // unrolled iteration template, shared shape on both engines:
    // r_{k+1}(v) = 150000 + (85 * Σ_{u→v} (r_k(u) div deg(u))) div 100
    def duckIter(k: Int): String =
      s"""r$k AS (
         |  SELECT d.src AS node,
         |    CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst, CAST(SUM(r.r // dg.deg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN r${k - 1} r ON r.node = e.src
         |    JOIN deg dg ON dg.src = e.src
         |    GROUP BY e.dst) c ON c.dst = d.src)""".stripMargin
    QueryDef.sql("q_pagerank")(
      s"""WITH cs AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |${(1 to Iters).map(duckIter).mkString(",\n")}
         |SELECT node, r AS rank_u FROM r$Iters ORDER BY node""".stripMargin) { (s, dir) =>
      // localCheckpoint pins RDD blocks for the session — snapshot the
      // registry so every block this query adds is released at the end
      val preexisting = s.sparkContext.getPersistentRDDs.keySet
      val cs = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // localCheckpoint: edges and degrees are reused every round — pin
      // them once instead of re-running the join 2×Iters times
      val edges = cs.unionByName(cs.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
      var r = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      for (_ <- 1 to Iters) {
        val contrib = edges
          .join(deg, "src")
          .join(r, col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("t"))
          .groupBy("dst").agg(sum(col("t")).as("s"))
        r = deg.select(col("src").as("node"))
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
          .localCheckpoint() // cut lineage: 5 rounds of joins would nest plans
      }
      val result = r.select(col("node"), col("r").as("rank_u")).orderBy("node")
      // distributed spill, never a driver collect: the result is one row
      // per node — cluster-sized at 100 TB
      graft.core.Spill.materialize(result) {
        s.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => preexisting.contains(id) }
          .values.foreach(_.unpersist(false))
      }
    }
  }

  val all: Seq[QueryDef] = Seq(pagerank)
}
