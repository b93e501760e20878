package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition over an undirected edge list —
  * the standard quality score for ANY community/label assignment
  * (Newman & Girvan '04): did the partition capture the graph's edge
  * concentration, or would a random rewiring with the same degrees do
  * as well?
  *
  *   Q = Σ_c [ L_c/m − (D_c/(2m))² ]
  *
  * (L_c intra-community edges, D_c total degree of community c, m total
  * edges). Scaled by 4m² it is the exact integer
  *
  *   Q·4m² = Σ_c (4m·L_c − D_c²)
  *
  * so the score accumulates in BIGINT and takes ONE double division at
  * the end — hash-checkable in any engine. Q ∈ [−0.5, 1); 0 means "no
  * better than random", and a labeling worth shipping usually clears
  * 0.3.
  *
  * Scale shape: two broadcast-able equi-joins attach the partition
  * label to each endpoint (the labels frame is node-sized, the edge
  * list is the big side and shuffles at most once per join key); L_c
  * and D_c are map-side-combinable conditional sums; the score is a
  * 1-row reduce. Magnitudes: |Q·4m²| ≤ 4m² + max D_c² ≤ 8m² — BIGINT
  * holds to m ≈ 10⁹ edges; beyond that, pre-aggregate per community
  * and divide at the community level.
  */
object Modularity {

  /** One summary row (n_groups, m_edges, q_num, modularity) scoring
    * `labels` (node, label) over the undirected `edges` (src, dst; each
    * unordered pair once). Nodes absent from `labels` would silently
    * drop edges — callers pass a total labeling. Runs as ONE job: m is
    * recovered from Σ dc = 2m, so the edge list is never counted
    * separately. */
  def score(edges: DataFrame, labels: DataFrame, node: String = "node",
      label: String = "label"): DataFrame = {
    val la = labels.select(col(node).as("src"), col(label).as("la"))
    val lb = labels.select(col(node).as("dst"), col(label).as("lb"))
    val tagged = edges.join(la, "src").join(lb, "dst")
    // per-community intra-edge count and degree sum in ONE pass over
    // the tagged edges: each edge contributes degree 1 to both
    // endpoints' communities (2 to its own when intra)
    val perC = tagged.select(explode(array(
        struct(col("la").as("c"), when(col("la") === col("lb"), 1L).otherwise(0L).as("intra")),
        struct(col("lb").as("c"), lit(0L).as("intra")))).as("x"))
      .select(col("x.c").as("c"),
        col("x.intra"),
        lit(1L).as("deg"))
      .groupBy(col("c"))
      .agg(sum(col("intra")).as("lc"), sum(col("deg")).as("dc"))
    // m never needs its own job: Σ dc = 2m (every edge contributes one
    // degree to each endpoint's community), so with twoM = Σ dc,
    // Q·4m² = 2·twoM·Σ lc − Σ dc² and the divisor is twoM².
    perC.agg(count(lit(1)).as("n_groups"),
      sum(col("lc")).as("__l"), sum(col("dc")).as("__twoM"),
      sum(col("dc") * col("dc")).as("__sd"))
      .select(col("n_groups"),
        expr("__twoM div 2").as("m_edges"),
        (lit(2L) * col("__twoM") * col("__l") - col("__sd")).as("q_num"),
        round((lit(2L) * col("__twoM") * col("__l") - col("__sd")).cast("double") /
          (col("__twoM").cast("double") * col("__twoM").cast("double")), 6)
          .as("modularity"))
  }
}
