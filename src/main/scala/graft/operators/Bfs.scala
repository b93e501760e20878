package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Multi-source breadth-first search over an undirected edge list —
  * the hop-distance primitive behind "within k hops of a trusted seed"
  * expansion, blast-radius queries, and curriculum-by-distance
  * sampling. Returns the exact minimum hop count from the nearest
  * source for every node reachable within `maxDepth`.
  *
  * Scale design (reference semantics, Spark-first plan): classic
  * frontier iteration — each round is ONE equi-join of the current
  * frontier against the symmetric edge list plus ONE anti-join against
  * the settled set, so a round costs two hash shuffles keyed on the
  * node id regardless of graph size. The frontier only ever holds the
  * newly-reached nodes (never the full reach set), and both the
  * frontier and the settled table are eagerly `localCheckpoint`ed per
  * round — uncut iterative lineage grows a ~k^rounds plan tree and
  * OOMs the driver (same discipline as [[Components]]/[[KCore]]).
  * `maxDepth` bounds the rounds; BFS settles every node at its true
  * distance the first time it is seen, so truncation never mislabels —
  * it only leaves far nodes unreported (they are not emitted, not
  * defaulted). Fault tolerance: cuts go through [[Checkpoints.cut]] —
  * `localCheckpoint` by default (blocks die with their executor;
  * correct at local[32]), reliable `checkpoint` when
  * SPARK_GRAFT_CHECKPOINT_DIR is set (the 1000-executor switch,
  * exercised by ReliableCheckpointSpec and the local-cluster run).
  */
object Bfs {

  /** Hop distance from the nearest of `sources` for every node within
    * `maxDepth` hops. `edges` columns `aCol`/`bCol` are undirected
    * endpoints (any orientation; duplicates and self-loops tolerated).
    * Output: (node, dist) with dist in [0, maxDepth]; sources report 0
    * even when isolated. */
  def levels(sources: DataFrame, edges: DataFrame, srcCol: String,
      aCol: String = "a", bCol: String = "b", maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 0 && maxDepth <= 64, s"maxDepth must be in [0, 64], got $maxDepth")
    val spark = sources.sparkSession
    val sym = edges
      .select(col(s"`$aCol`").as("u"), col(s"`$bCol`").as("v"))
      .filter(col("u") =!= col("v"))
      .unionAll(edges.select(col(s"`$bCol`").as("u"), col(s"`$aCol`").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frontier = Checkpoints.cut(
      sources.select(col(s"`$srcCol`").as("node")).distinct())
    var settled = Checkpoints.cut(frontier.withColumn("dist", lit(0L)))
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      val next = Checkpoints.cut(
        frontier.join(sym, frontier("node") === sym("u"))
          .select(col("v").as("node")).distinct()
          .join(settled, Seq("node"), "left_anti"))
      depth += 1
      settled = Checkpoints.cut(
        settled.unionAll(next.withColumn("dist", lit(depth.toLong))))
      frontier = next
    }
    // under the lazy cut the final round's join may not have
    // materialized yet (maxDepth exit skips its isEmpty probe) —
    // materialize before releasing the edge cache it reads
    settled.count(): Unit
    sym.unpersist()
    settled.select(col("node"), col("dist"))
  }

  /** DuckDB half of [[levels]]: recursive reach with per-round depth,
    * reduced to min-dist per node. The recursive UNION deduplicates
    * (node, d) rows, so the enumeration is bounded by nodes·maxDepth,
    * never by path count. `edgeCte` must define `e(src, dst)` SYMMETRIC
    * (both directions present); `srcCte` must define `s(node)`. */
  def levelsOracle(edgeCte: String, srcCte: String, maxDepth: Int = 3): String =
    s"""WITH RECURSIVE $edgeCte,
       |$srcCte,
       |r AS (SELECT node, 0 AS d FROM s
       |      UNION
       |      SELECT e.dst AS node, r.d + 1 AS d
       |      FROM r JOIN e ON e.src = r.node WHERE r.d < $maxDepth)
       |SELECT node, min(d)::BIGINT AS dist FROM r GROUP BY 1""".stripMargin
}
