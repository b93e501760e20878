package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  *  - Brute-force cosine top-k: the exact baseline. The (small) query set
  *    is broadcast against the corpus — a map-side nested loop with no
  *    shuffle of the corpus, then a per-query top-k window. At 100 TB the
  *    corpus streams once per query batch; cost is linear in corpus size.
  *  - Sign-random-projection LSH: 4 fixed hyperplanes → 16 buckets; ANN
  *    candidates are same-bucket rows, turning search into an equi-join
  *    on the bucket id (bucketed shuffle). More planes trade recall for
  *    bucket sparsity; an IVF variant would replace the planes with
  *    k-means centroids, same join shape.
  *
  * Determinism contract with the DuckDB oracle ([[Oracles]]): dot
  * products and norms are explicit left-associated 64-term chains over
  * double-cast elements (bit-identical IEEE evaluation in any engine —
  * no reliance on an engine's sum order), sqrt is IEEE-exact, and
  * similarities are rounded before ranking; ties break by vec_id.
  */
object Ann {
  /** Embedding dimensionality of the testdata corpus. */
  val Dim = 64
  /** Hyperplane count for sign-LSH (2^Planes buckets). */
  val Planes = 4
  val TopK = 3
  /** Query set: vec_id < NumQueries. */
  val NumQueries = 10
  /** IVF coarse-quantizer size: cells seeded from the first vectors and
    * refined by [[KMeansIters]] Lloyd rounds. */
  val NumCentroids = 8
  /** Lloyd update rounds for the IVF coarse quantizer. 0 = untrained
    * (cells seeded from the first vectors — the recall baseline). */
  val KMeansIters = 2
  /** Centroid-mean quantization: member values are scaled by 2^20 and
    * floored BEFORE summing, so every partial sum is an exact integer in
    * a double — the sum is order-independent and the resulting mean is
    * bit-identical across engines (a raw double sum would depend on
    * Spark's partial-aggregation order and could not be re-derived by
    * the DuckDB oracle). A float32 times 2^20 is exact in double, so the
    * only loss is the sub-2^-20 floor — noise for clustering. */
  val CentroidQuant = 1048576.0d
  /** Within-bucket cosine threshold for embedding near-dup pairs. */
  val CosineDupThreshold = 0.4
  /** Corpus-slice label for the filtered-search oracle row. */
  val FilterLabel = 3
  /** Product-quantization geometry: [[PqSubspaces]] blocks of
    * [[PqSubDim]] dims, each coded against [[PqCentroids]] centroids
    * refined by [[PqIters]] Lloyd rounds — 64 float32 dims compress to
    * 8 code bytes (32× smaller), the memory-bound ANN scale path. */
  val PqSubspaces = 8
  val PqSubDim: Int = Dim / PqSubspaces
  val PqCentroids = 32
  val PqIters = 1

  /** Σ a[i]·b[i] via the native codegen'd [[graft.functions.DotProduct]]
    * expression — a fused loop, bit-identical to the oracle's explicit
    * left-associated chain. */
  private def dot(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    graft.functions.Functions.dot(spark, a, b)

  /** Deterministic hyperplane weights, precomputed on the driver from
    * sha256("plane_j_i") hex digits and inlined as LITERALS in both the
    * Spark plan and the oracle SQL (so no cross-engine hashing is ever
    * needed): w(j,i) = hexDigit − 7.5, a fixed pseudo-random value in
    * [−7.5, 7.5] \ {0} — exactly representable, so both engines evaluate
    * the identical IEEE expression. */
  def planeWeight(j: Int, i: Int): Double = {
    val h = graft.hashing.Hashing.sha256Hex(s"plane_${j}_$i")
    Integer.parseInt(h.substring(0, 1), 16) - 7.5
  }

  /** Σ w(j,i)·e[i] for plane j, as a left-associated literal chain
    * (weights are .5-grid values, exactly representable in float AND
    * double, so the chain and the oracle's literal arithmetic agree). */
  def projection(e: Column, j: Int): Column =
    (1 to Dim).map(i => lit(planeWeight(j, i - 1)) * element_at(e, i).cast("double"))
      .reduce(_ + _)

  /** Bucket id: the planes-bit sign pattern of the projections. More
    * planes → sparser buckets (lower recall, cheaper join); the object's
    * val is the oracle-pinned default. */
  def bucket(e: Column, planes: Int = Planes): Column =
    (0 until planes).map(j => when(projection(e, j) > 0, 1 << (planes - 1 - j)).otherwise(0))
      .reduce(_ + _)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot(df.sparkSession, col("embedding"), col("embedding"))))

  /** Exact top-k cosine neighbors for each query vector (vec_id <
    * NumQueries), excluding self. Queries are broadcast; the corpus is
    * scanned once. */
  /** Margin for [[contrastiveTriplets]]: the hard negative is the
    * highest-cosine vector at least this far below the positive. */
  val TripletMargin = 0.05

  /** Contrastive TRIPLET mining — the training-data operator an
    * embedding-model pipeline runs over its corpus: for each anchor in
    * the query slice, positive = the exact nearest neighbor, hard
    * negative = the highest-cosine vector at least [[TripletMargin]]
    * below the positive (the "semi-hard" band of FaceNet/Schroff '15 —
    * close enough to be informative, separated enough to be a true
    * negative). Ordering is total ((sim desc, vec_id)), sims are
    * round-4 — the determinism contract the whole ANN family pins.
    *
    * Scale shape: the anchor slice broadcasts and the corpus is scanned
    * ONCE (this is the eval-slice exact baseline, bounded by
    * `numQueries` — the family's standard pattern); the corpus-wide
    * variant restricts candidates to the anchor's trained IVF cell
    * exactly as [[knnGraph]]/[[ivfTopK]] do, with the same measured
    * recall trade. */
  def contrastiveTriplets(embeddings: DataFrame, numQueries: Int = NumQueries,
      margin: Double = TripletMargin): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qe"), col("nrm").as("qn")))
    val pairs = n.join(q, col("vec_id") =!= col("anchor_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
      .select(col("anchor_id"), col("vec_id"), col("sim"))
    val w = Window.partitionBy(col("anchor_id")).orderBy(col("sim").desc, col("vec_id"))
    val pos = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id").as("pos_id"), col("sim").as("pos_sim"))
    val negCand = pairs.join(pos, Seq("anchor_id"))
      .filter(col("sim") <= col("pos_sim") - margin)
      .select(col("anchor_id"), col("vec_id"), col("sim"))
    val neg = negCand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("vec_id").as("neg_id"), col("sim").as("neg_sim"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("pos_id"), col("pos_sim"), col("neg_id"), col("neg_sim"))
  }

  def cosineTopK(embeddings: DataFrame, k: Int = TopK,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn")))
    val pairs = n.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** Embedding-cosine near-dup pairs, bucketed by sign-LSH: candidates
    * are same-bucket pairs (equi-join on the bucket id), verified by
    * exact cosine at [[CosineDupThreshold]]. Recall < 1 by construction
    * (cross-bucket near pairs are unseen) — the standard trade; add
    * planes/probes to tighten. */
  def embeddingPairs(embeddings: DataFrame, planes: Int = Planes,
      threshold: Double = CosineDupThreshold): DataFrame = {
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
      .withColumn("bucket", bucket(col("embedding"), planes))
    val a = n.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = n.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", round(dot(ss, col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  /** Within-cell cosine threshold for semantic dedup ([[semanticDedup]]). */
  val SemanticEps = 0.4

  /** Semantic dedup in the SemDeDup shape (Abbas et al. '23,
    * arXiv:2303.09540): coarse k-means cells (the trained IVF quantizer,
    * [[ivfCentroids]]) restrict candidate generation, and within a cell a
    * vector is superseded by its EARLIEST (lowest-id) neighbor at cosine
    * ≥ `eps`. Output is one row per vector: (vec_id, cell, keeper_id)
    * where keeper_id is that dominator, or the vector itself when no
    * earlier in-cell neighbor clears the bar — downstream keeps the rows
    * with keeper_id = vec_id.
    *
    * Contract note: the earliest-eps-neighbor rule replaces the paper's
    * per-group random keeper. It is deterministic and embarrassingly
    * parallel — no sequential admission scan, no transitive closure —
    * so the whole operator is one within-cell self-join plus a min
    * aggregate. (For transitive duplicate CLUSTERS over embedding pairs,
    * compose [[embeddingPairs]] with [[Dedup.clustersFromPairs]].)
    *
    * Scale shape: cell assignment is a narrow map against the literal
    * trained book; the self-join is an equi-join on the cell id — never
    * all-pairs — and the shuffle after it carries (vec_b, keeper)
    * pairs, not vectors. At 100 TB the candidate volume is Σ cells k²
    * with k bounded by cell size; raise [[NumCentroids]] to keep cells
    * small (the SemDeDup paper runs 50k clusters for web scale). */
  /** Neighbors kept per vector in [[knnGraph]]. */
  val KnnK = 3

  /** IVF-restricted k-NN GRAPH — the neighborhood structure semantic
    * clustering, agglomerative dedup, and graph-based diversity
    * sampling all start from: for every vector, its `k` nearest
    * same-cell neighbors by exact cosine (rank is total-ordered by
    * (sim desc, neighbor id), so the row set is deterministic).
    * Restricting candidates to the trained coarse cell is what makes
    * the graph buildable at corpus scale: the join is an EQUI-join on
    * the cell id (never an all-pairs product), the same trade
    * [[semanticDedup]] and [[ivfTopK]] pin — cross-cell true neighbors
    * are unseen, add probes to tighten.
    *
    * Scale shape: one broadcast codebook assignment (narrow), one
    * cell-keyed self-join whose fan-out is Σ|cell|², one per-vector
    * top-k window partitioned by the 8-byte vec id. The celled frame is
    * NOT persisted: the result is corpus-sized and lazy, so a persist
    * here could never be released ([[semanticClusters]] had to
    * materialize-then-unpersist for exactly this reason) — instead the
    * narrow scan+assign recomputes once per join side, which at 100 TB
    * beats pinning a corpus-sized cache entry for the application
    * lifetime; the codebook itself is computed once on the driver
    * either way. */
  def knnGraph(embeddings: DataFrame, k: Int = KnnK,
      numCentroids: Int = NumCentroids, iters: Int = KMeansIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val book = ivfCentroids(embeddings, numCentroids, iters)
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val assigned = n
      .withColumn("cell", pqEncodeCol(ss, col("embedding"), book).cast("long"))
    val a = assigned.select(col("cell"), col("vec_id"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("neighbor_id"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, Seq("cell")).filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round(dot(ss, col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** kNN-graph recall harness — the measure-before-trust row for
    * [[knnGraph]] (the graph sibling of `ann_ivf`'s recall rows): for
    * the query slice, how many of the TRUE top-k cosine neighbors
    * (exact brute force over the whole corpus) does the cell-restricted
    * graph keep? Cross-cell true neighbors are exactly what the IVF
    * restriction loses, and this is the number that says whether the
    * loss is tolerable before clustering/sampling consumes the graph.
    * One summary row: (n_truth_edges, n_hit, recall). */
  def knnRecall(embeddings: DataFrame, k: Int = KnnK,
      numQueries: Int = NumQueries): DataFrame = {
    val truth = cosineTopK(embeddings, k, numQueries)
      .select(col("query_id").as("vec_id"), col("vec_id").as("neighbor_id"))
    val approx = knnGraph(embeddings, k)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("neighbor_id"), lit(true).as("__hit"))
    truth.join(approx, Seq("vec_id", "neighbor_id"), "left_outer")
      .agg(count(lit(1)).as("n_truth_edges"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hit"))
      .select(col("n_truth_edges"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth_edges"), 4).as("recall"))
  }

  /** Semantic CLUSTERS via the mutual-kNN graph — the clustering
    * consumer of [[knnGraph]]: keep only RECIPROCATED neighbor edges
    * (u lists v AND v lists u — the standard mutual-kNN denoising: a
    * hub that everyone lists but that lists only its own cell-mates
    * stops gluing unrelated clusters together), then connected
    * components over the surviving edges, reported as a cluster-size
    * histogram including singletons. This is the cheap, deterministic
    * semantic-grouping pass a diversity sampler or a near-dup auditor
    * runs over an embedded corpus.
    *
    * Scale shape: the graph build is [[knnGraph]]'s cell equi-join (the
    * graph frame persists once — it feeds BOTH sides of the
    * reciprocation self-join); mutuality is one equi-join on the
    * (u, v) key pair; components ride the shared star-contraction
    * machinery. */
  def semanticClusters(embeddings: DataFrame, k: Int = KnnK,
      numCentroids: Int = NumCentroids, iters: Int = KMeansIters): DataFrame = {
    val g = knnGraph(embeddings, k, numCentroids, iters)
      .select(col("vec_id").as("u"), col("neighbor_id").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mutual = g.join(g.select(col("v").as("u"), col("u").as("v")), Seq("u", "v"))
    val pairs = mutual.filter(col("u") < col("v"))
      .select(col("u").as("doc_a"), col("v").as("doc_b"))
    val nodes = embeddings.select(col("vec_id"))
    val sizes = graft.pipeline.Dedup.clustersFromPairs(nodes, pairs, "vec_id")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    // materialize while the graph cache is alive, then release it
    val rows = sizes.collect().toSeq
    g.unpersist()
    embeddings.sparkSession.createDataFrame(
      embeddings.sparkSession.sparkContext.parallelize(rows, 1), sizes.schema)
  }

  def semanticDedup(embeddings: DataFrame, eps: Double = SemanticEps,
      numCentroids: Int = NumCentroids, iters: Int = KMeansIters): DataFrame = {
    val ss = embeddings.sparkSession
    val book = ivfCentroids(embeddings, numCentroids, iters)
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    // persisted: the celled frame feeds both sides of the self-join and
    // the final verdict join (independently-built subtrees cannot share
    // an exchange otherwise)
    val assigned = n
      .withColumn("cell", pqEncodeCol(ss, col("embedding"), book).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val doms = a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
      .withColumn("sim",
        round(dot(ss, col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= eps)
      .groupBy(col("vec_b")).agg(min(col("vec_a")).as("__keeper"))
    assigned.join(doms, col("vec_id") === col("vec_b"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("__keeper"), col("vec_id")).as("keeper_id"))
  }

  /** [[semanticContamination]] eval-set size (vec_id < this is "the
    * benchmark"); the flag threshold reuses [[SemanticEps]]. */
  val BenchSetSize = 32

  /** Semantic DECONTAMINATION — the embedding-space sibling of the
    * n-gram `text_contamination` gate: n-gram overlap misses a
    * paraphrased or translated copy of an eval item, cosine similarity
    * does not. Corpus vectors that land in the same trained cell as a
    * benchmark vector and clear the threshold are flagged with their
    * hit count and closest benchmark item (sim desc, then bench id —
    * deterministic). Same-cell-only candidate generation is the
    * [[semanticDedup]] geometry: bounded, never corpus × bench, with
    * the recall/τ trade the LSH/IVF recall harnesses measure.
    *
    * Scale shape: one narrow cell assignment over the corpus, the
    * benchmark side is SMALL by definition and broadcasts, and the only
    * exchange after the broadcast join is the per-doc verdict window on
    * vec_id. At 100 TB this is a broadcast-filter scan — the shape you
    * can afford to run on every ingest batch. */
  def semanticContamination(embeddings: DataFrame, benchSize: Int = BenchSetSize,
      tau: Double = SemanticEps, numCentroids: Int = NumCentroids,
      iters: Int = KMeansIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val book = ivfCentroids(embeddings, numCentroids, iters)
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val assigned = n.withColumn("cell", pqEncodeCol(ss, col("embedding"), book).cast("long"))
    val bench = assigned.filter(col("vec_id") < benchSize)
      .select(col("cell"), col("vec_id").as("bench_id"),
        col("embedding").as("be"), col("nrm").as("bn"))
    val hits = assigned.filter(col("vec_id") >= benchSize)
      .join(broadcast(bench), Seq("cell"))
      .withColumn("sim", round(dot(ss, col("embedding"), col("be")) / (col("nrm") * col("bn")), 4))
      .filter(col("sim") >= tau)
    val w = Window.partitionBy(col("vec_id"))
    val rk = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("bench_id"))
    hits
      .withColumn("n_bench_hits", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("n_bench_hits"),
        col("bench_id").as("best_bench_id"), col("sim").as("best_sim"))
  }

  /** Train the IVF coarse quantizer: cells seeded from the first `k`
    * vectors, refined by `iters` quantized-mean Lloyd rounds. ONE Spark
    * job per round (the fused [[graft.functions.PqEncode]] literal
    * argmin assigns cells in a narrow map; the grouped quantized sums
    * collect to the driver, where the means fold with the same
    * left-associated arithmetic the oracle replays). A cell that loses
    * all members drops out — the standard Lloyd degeneracy,
    * deterministic on both engines. `iters = 0` returns the untrained
    * first-`k` seeds (the recall baseline the spec compares against). */
  def ivfCentroids(embeddings: DataFrame, k: Int = NumCentroids,
      iters: Int = KMeansIters): Seq[(Int, Array[Double])] = {
    val ss = embeddings.sparkSession
    val n = embeddings.select(col("vec_id"), col("embedding"))
    var book: Seq[(Int, Array[Double])] = n.filter(col("vec_id") < k).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1).toSeq
    for (_ <- 1 to iters) {
      val sums = (1 to Dim).map(i =>
        sum(floor(element_at(col("embedding"), i).cast("double") * lit(CentroidQuant))).as(s"s$i"))
      val aggs = sums :+ count(lit(1)).as("__cnt")
      val rows = n.withColumn("cell", pqEncodeCol(ss, col("embedding"), book))
        .groupBy(col("cell")).agg(aggs.head, aggs.tail: _*)
        .collect()
      book = rows.map { r =>
        val cnt = r.getLong(1 + Dim)
        (r.getInt(0), (1 to Dim).map(i => (r.getLong(i).toDouble / cnt) / CentroidQuant).toArray)
      }.sortBy(_._1).toSeq
    }
    book
  }

  /** IVF ANN with a trained coarse quantizer: cells seeded from the
    * first `numCentroids` vectors, refined by `iters` Lloyd rounds
    * (assignment + quantized-mean update, all cross-engine
    * deterministic — see [[ivfCentroids]]), then each query probes only
    * its own cell for the best cosine neighbor. Assignment is a narrow
    * map against the literal trained book (ONE job per Lloyd round);
    * the probe stays the bucketed equi-join on the cell id. `iters = 0`
    * reproduces the untrained first-N quantizer (the recall baseline
    * the spec compares against). */
  def ivfTopK(embeddings: DataFrame, numCentroids: Int = NumCentroids,
      numQueries: Int = NumQueries, iters: Int = KMeansIters): DataFrame =
    ivfServe(embeddings, ivfCentroids(embeddings, numCentroids, iters), numQueries)

  /** SERVE an IVF index from an already-trained centroid book — the
    * query path alone, no training job: the book is a literal (a
    * trained index's coarse quantizer is k vectors — driver-sized by
    * design, faiss ships it as a file), assignment is the fused-argmin
    * narrow map, the probe is the bucketed equi-join. This split is
    * what makes the index a PERSISTABLE ARTIFACT: train once
    * ([[ivfCentroids]]), store ([[ivfPersistServe]]), serve forever. */
  def ivfServe(embeddings: DataFrame, book: Seq[(Int, Array[Double])],
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    // cell assignment is a narrow map against the literal trained book
    val assigned = n.withColumn("cell", pqEncodeCol(ss, col("embedding"), book))
    val q = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell"))
    val pairs = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** PERSIST the trained IVF index and serve it back WITHOUT
    * retraining — the missing half of train/serve at 100 TB, where the
    * centroid book is the expensive artifact (k-means over the corpus)
    * and queries must never pay for it again:
    *
    *  1. '''train''' [[ivfCentroids]] once;
    *  2. '''store''' the book as a VERSIONED artifact through
    *     [[graft.streaming.VersionedSnapshot]] — `_SUCCESS`-gated
    *     parquet versions behind the `__latest` pointer, so a torn
    *     write can never serve, a re-publish is one conditional
    *     pointer advance, and old books sweep to the two-version
    *     retention window (same machinery the streamed sketches
    *     restart on, same object-store posture);
    *  3. '''restore''' in a FRESH SparkSession (`newSession()` —
    *     separate SQL conf/temp state; the read resolves purely
    *     through the pointer + commit gate on disk, nothing cached
    *     in-session) and rebuild the literal book from the k stored
    *     rows;
    *  4. '''serve''' [[ivfServe]] from the restored book.
    *
    * The oracle row (`ann_ivf_persist`) hash-checks the SERVED results
    * against the same DuckDB derivation as `ann_ivf_topk` — restored
    * index ≡ in-session index, to the bit. AnnPersistSpec pins the
    * restore really round-trips the book and that a second publish
    * supersedes the first. */
  def ivfPersistServe(embeddings: DataFrame, workDir: String,
      numCentroids: Int = NumCentroids, numQueries: Int = NumQueries,
      iters: Int = KMeansIters): DataFrame = {
    val ss = embeddings.sparkSession
    import ss.implicits._
    val book = ivfCentroids(embeddings, numCentroids, iters)
    val store = new graft.streaming.VersionedSnapshot(
      ss, java.nio.file.Paths.get(workDir, "ivfbook"))
    store.write(1L, book.toDF("cell", "centroid"))
    // fresh session: the restore path sees only what the store
    // committed to disk
    val s2 = ss.newSession()
    val restored = new graft.streaming.VersionedSnapshot(
      s2, java.nio.file.Paths.get(workDir, "ivfbook"))
      .newestBelow(Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed ivf book under $workDir/ivfbook"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    ivfServe(embeddings, restored, numQueries)
  }

  /** IVF cell-balance census over the TRAINED coarse quantizer — the
    * capacity-planning statistic behind every IVF deployment (faiss's
    * imbalance_factor): imbalance = n_cells·Σs²/(Σs)², the expected
    * probe-cost multiplier vs perfectly balanced cells (1.0 = balanced;
    * k = everything in one cell). Decides nprobe/cell-count BEFORE a
    * 100 TB index build; the recall harnesses measure quality, this
    * measures the cost skew. Exact integer cell sizes + ONE fixed IEEE
    * expression, so the statistic itself hash-checks.
    *
    * Scale shape: assignment is the same narrow fused-argmin map as
    * every IVF path; then one map-side-combinable count per cell and a
    * single-row reduce over ≤ numCentroids rows. */
  def ivfBalance(embeddings: DataFrame, numCentroids: Int = NumCentroids,
      iters: Int = KMeansIters): DataFrame = {
    val ss = embeddings.sparkSession
    val book = ivfCentroids(embeddings, numCentroids, iters)
    // n_cells is the TRAINED cell count (faiss's nlist), NOT the count
    // of non-empty groups: maximal skew (everything in one cell) must
    // read imbalance = n_cells, not 1.0 — an empty cell is exactly the
    // wasted capacity the statistic prices
    val nCells = book.size
    val sizes = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("cell", pqEncodeCol(ss, col("embedding"), book))
      .groupBy(col("cell")).agg(count(lit(1)).as("s"))
    sizes.agg(sum(col("s")).as("n_vecs"),
        max(col("s")).as("max_cell"), sum(col("s") * col("s")).as("sum_sq"))
      .select(lit(nCells.toLong).as("n_cells"), col("n_vecs"), col("max_cell"),
        round((lit(nCells).cast("double") * col("sum_sq").cast("double")) /
          (col("n_vecs").cast("double") * col("n_vecs").cast("double")), 4).as("imbalance"))
  }

  /** Probe width for [[ivfNprobeTopK]] — faiss's nprobe, the second of
    * the two IVF knobs ([[ivfBalance]] prices the first, nlist). */
  val IvfNprobe = 2

  /** IVF with MULTI-CELL PROBING (nprobe > 1) — the recall/cost dial
    * every production IVF deployment turns: a query whose true nearest
    * neighbor fell just across a Voronoi boundary (the single-probe
    * [[ivfTopK]]'s miss mode) recovers it by searching its `nprobe`
    * nearest cells instead of one. Corpus assignment stays the fused
    * argmin narrow map; the QUERY side ranks all centroids by the same
    * dist² chain (queries × k is tiny — NumQueries·nlist rows through
    * one window) and the probe is the same bucketed equi-join, now
    * landing on nprobe cells per query — cost scales exactly nprobe×
    * the single-probe scan, which is the entire point of the knob.
    * Output shape ≡ [[ivfTopK]] (best cosine neighbor per query), so
    * recall(nprobe=2) ≥ recall(nprobe=1) row-by-row is directly
    * observable against `ann_ivf_topk`. */
  def ivfNprobeTopK(embeddings: DataFrame, numCentroids: Int = NumCentroids,
      numQueries: Int = NumQueries, iters: Int = KMeansIters,
      nprobe: Int = IvfNprobe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val book = ivfCentroids(embeddings, numCentroids, iters)
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val assigned = n.withColumn("cell", pqEncodeCol(ss, col("embedding"), book))
    // query-side cell ranking against the literal centroid frame — the
    // same (c·c) − 2·(v·c) left-associated chain the oracle states,
    // evaluated on NumQueries × nlist rows (a broadcast cross of two
    // tiny frames, never the corpus)
    import ss.implicits._
    val bookDf = book.map { case (c, ce) => (c, ce.toSeq) }.toDF("cell", "ce")
    val cc = (1 to Dim).foldLeft(lit(0.0)) { (acc, i) =>
      acc + element_at(col("ce"), i) * element_at(col("ce"), i)
    }
    val vc = (1 to Dim).foldLeft(lit(0.0)) { (acc, i) =>
      acc + element_at(col("embedding"), i).cast("double") * element_at(col("ce"), i)
    }
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("cell"))
    val qcells = n.filter(col("vec_id") < numQueries)
      .crossJoin(broadcast(bookDf))
      .withColumn("dist2", cc - lit(2.0) * vc)
      .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell"))
    val pairs = assigned.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** Base/new split for [[ivfIncremental]]: vectors below it are the
    * indexed corpus the coarse quantizer trained on, vectors at or
    * above arrive as the new batch. Fixed (not data-derived) so the
    * oracle states the same literal. */
  val IvfIncrementalSplit = 400L

  /** Drift² threshold for [[ivfIncremental]]'s retrain flag: measured
    * against the testdata, per-cell drift² spans ≈0.0042–0.0076 at
    * sf0.001/0.01 and ≈0.0063–0.0109 at sf0.1, so 0.007 sits strictly
    * inside every scale's spread — both flag values appear at every sf
    * (the check is non-vacuous) and a wrong assignment anywhere moves
    * some cell's mean enough to flip a flag or a drift digit. */
  val IvfDriftTau = 0.007

  /** INCREMENTAL IVF INDEX MAINTENANCE — the arrival path of a live
    * vector index, completing what the dedup family already has
    * (`dedup_incremental_near` / `streaming_neardup_admit`): a NEW
    * batch of embeddings is folded into an EXISTING index without
    * retraining — assignment to the frozen coarse centroids is the
    * same narrow fused-argmin map as every IVF path, O(batch) with no
    * shuffle wider than the batch — plus the DRIFT-TRIGGERED RETRAIN
    * SIGNAL that tells the pipeline when incremental assignment has
    * stopped being honest: per cell, the displacement² between the
    * trained centroid and the post-batch member mean (the
    * [[graft.pipeline.Embeddings.centroidDrift]] statistic pointed at
    * index maintenance). Cells whose displacement² ≥ `tau` flag
    * retrain = 1.
    *
    * Determinism: the quantizer trains on the base slice only (same
    * quantized-mean Lloyd as [[ivfCentroids]], which the oracle
    * re-derives bit-for-bit); post-batch means use the same
    * floor-quantized integer sums; drift² is one fixed left-associated
    * IEEE chain, rounded. Output is per NEW vector (its cell carries
    * the cell's drift verdict), so the hash check pins every
    * assignment AND every flag.
    *
    * Scale shape: train-side collects are k-sized codebooks (the
    * [[ivfCentroids]] contract); the batch assignment is scan-side;
    * the drift census is one map-side-combinable aggregate to ≤ k
    * rows joined back broadcast. At 100 TB the census rides the same
    * pass that writes the batch's postings. */
  def ivfIncremental(embeddings: DataFrame, split: Long = IvfIncrementalSplit,
      numCentroids: Int = NumCentroids, iters: Int = KMeansIters,
      tau: Double = IvfDriftTau): DataFrame =
    ivfIncrementalWith(embeddings,
      ivfCentroids(embeddings.filter(col("vec_id") < split), numCentroids, iters),
      split, tau)

  /** The incremental-maintenance body over an ALREADY-TRAINED frozen
    * book — the [[ivfServe]] split for the arrival path, so a
    * persisted index can keep ingesting after a restore
    * ([[ivfPersistIncremental]]) without retraining its quantizer. */
  def ivfIncrementalWith(embeddings: DataFrame,
      book: Seq[(Int, Array[Double])], split: Long = IvfIncrementalSplit,
      tau: Double = IvfDriftTau): DataFrame = {
    val ss = embeddings.sparkSession
    val assigned = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("cell", pqEncodeCol(ss, col("embedding"), book))
    // post-batch member means per cell (base ∪ new under the frozen
    // book), as exact floor-quantized integer sums — ivfCentroids'
    // update arithmetic
    val sums = (1 to Dim).map(i =>
      sum(floor(element_at(col("embedding"), i).cast("double") * lit(CentroidQuant))).as(s"s$i"))
    val census = assigned.groupBy(col("cell"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("__cnt")): _*)
    // the trained book as a k-row literal frame, joined broadcast
    import ss.implicits._
    val bookDf = book.map { case (c, ce) => (c, ce.toSeq) }.toDF("cell", "ce")
    val drift2 = (1 to Dim).foldLeft(lit(0.0)) { (acc, i) =>
      val d = col(s"s$i").cast("double") / col("__cnt") / lit(CentroidQuant) -
        element_at(col("ce"), i)
      acc + d * d
    }
    val verdicts = census.join(broadcast(bookDf), "cell")
      .select(col("cell"), round(drift2, 4).as("drift2"))
      .withColumn("retrain", when(col("drift2") >= tau, lit(1)).otherwise(lit(0)))
    assigned.filter(col("vec_id") >= split)
      .join(broadcast(verdicts), "cell")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("drift2"), col("retrain"))
  }

  /** THE LIVE-INDEX RESTART, composed: restore a PERSISTED index and
    * keep ingesting — [[ivfPersistServe]]'s store/restore protocol
    * feeding [[ivfIncrementalWith]]'s arrival path. The book trains on
    * the base slice once, publishes through
    * [[graft.streaming.VersionedSnapshot]], a FRESH session restores
    * it, and the new batch is assigned to the RESTORED frozen
    * centroids with the drift²-triggered retrain flag — the full
    * lifecycle of a production vector index across a process restart
    * (train → publish → crash/redeploy → restore → ingest), no retrain
    * anywhere after the publish. The `ann_ivf_persist_incr` oracle row
    * hash-checks against the SAME DuckDB derivation as
    * `ann_ivf_incremental`: a restore that perturbed one centroid bit
    * would flip an assignment or a drift digit. */
  def ivfPersistIncremental(embeddings: DataFrame, workDir: String,
      split: Long = IvfIncrementalSplit, numCentroids: Int = NumCentroids,
      iters: Int = KMeansIters, tau: Double = IvfDriftTau): DataFrame = {
    val ss = embeddings.sparkSession
    import ss.implicits._
    val book = ivfCentroids(
      embeddings.filter(col("vec_id") < split), numCentroids, iters)
    val store = new graft.streaming.VersionedSnapshot(
      ss, java.nio.file.Paths.get(workDir, "ivfbook"))
    store.write(1L, book.toDF("cell", "centroid"))
    val s2 = ss.newSession()
    val restored = new graft.streaming.VersionedSnapshot(
      s2, java.nio.file.Paths.get(workDir, "ivfbook"))
      .newestBelow(Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed ivf book under $workDir/ivfbook"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    ivfIncrementalWith(embeddings, restored, split, tau)
  }

  /** Bucket census: LSH bucket id → membership stats. */
  def lshBuckets(embeddings: DataFrame, planes: Int = Planes): DataFrame =
    embeddings.select(col("vec_id"), bucket(col("embedding"), planes).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))

  /** The j-th subvector (element-exact float→double cast). */
  private def subVec(e: Column, j: Int): Column =
    slice(e, j * PqSubDim + 1, PqSubDim).cast("array<double>")

  /** Train the per-subspace PQ codebooks (Jégou et al. '11 product
    * quantization): for each of the [[PqSubspaces]] blocks, k-means over
    * the block's subvectors — seeded from the first [[PqCentroids]]
    * vectors and refined by the same deterministic quantized-mean Lloyd
    * rounds as the IVF coarse quantizer. Returns the driver-side
    * codebooks, sorted by cent_id: a bounded m × k × subDim doubles
    * table (8·32·8 here), the thing a real deployment broadcasts to
    * every executor. */
  def pqCodebooks(embeddings: DataFrame, k: Int = PqCentroids,
      iters: Int = PqIters): Seq[Seq[(Int, Array[Double])]] = {
    val ss = embeddings.sparkSession
    val n = embeddings.select(col("vec_id"), col("embedding"))
    // seed: the first k vectors, collected once (pushed-down bounded
    // filter), sliced into per-subspace seed books on the driver
    val seeds = n.filter(col("vec_id") < k).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    var books: Seq[Seq[(Int, Array[Double])]] = (0 until PqSubspaces).map { j =>
      seeds.map { case (cid, v) =>
        (cid, v.slice(j * PqSubDim, (j + 1) * PqSubDim))
      }.toSeq
    }
    // ONE Spark job per Lloyd round for ALL subspaces (not one per
    // subspace per round — at real scale the fixed per-job cost of 8×
    // sequential mini-jobs dwarfs the work): posexplode every vector
    // into (j, subvector), assign by literal-codebook argmin with the
    // full ((v·v + c·c) − 2·v·c) chain (the same IEEE shape as the
    // oracle's training CTEs), aggregate quantized sums grouped by
    // (j, cell), and fold the means on the driver — (sum / count) / Q
    // in driver doubles is bit-identical to the oracle's SQL division.
    for (_ <- 1 to iters) {
      val frozen = books
      val exploded = n.select(col("vec_id"),
        posexplode(array((0 until PqSubspaces).map(j => subVec(col("embedding"), j)): _*))
          .as(Seq("j", "sv")))
      val codeExpr = (0 until PqSubspaces).map { j =>
        j -> pqEncodeCol(ss, col("sv"), frozen(j))
      }.foldRight(lit(-1): Column) { case ((j, e), els) =>
        when(col("j") === j, e).otherwise(els)
      }
      val sums = (1 to PqSubDim).map(i =>
        sum(floor(element_at(col("sv"), i) * lit(CentroidQuant))).as(s"s$i"))
      val aggs = sums :+ count(lit(1)).as("__cnt")
      val rows = exploded.withColumn("cell", codeExpr)
        .groupBy(col("j"), col("cell")).agg(aggs.head, aggs.tail: _*)
        .collect()
      books = (0 until PqSubspaces).map { j =>
        rows.filter(_.getInt(0) == j).map { r =>
          val cnt = r.getLong(2 + PqSubDim)
          // Spark's floor yields LONG sums; the exact-integer value is
          // identical to the oracle's double-typed floor sum, and the
          // long→double conversion is exact below 2^53
          val ce = (1 to PqSubDim).map(i => (r.getLong(1 + i).toDouble / cnt) / CentroidQuant).toArray
          (r.getInt(1), ce)
        }.sortBy(_._1).toSeq
      }
    }
    books
  }

  /** PQ asymmetric-distance ANN: corpus vectors are encoded to one code
    * per subspace against the TRAINED codebooks; each query scores every
    * corpus vector by the ADC inner product Σⱼ ⟨q_subⱼ, centroidⱼ[codeⱼ]⟩
    * and keeps the top-1 (ties by vec_id). This is deliberately a SCAN —
    * PQ's scale story is memory-bound brute force: 64 float32 dims
    * become 8 code bytes (32×), so the whole corpus's codes fit where
    * 3% of the raw vectors would, and the scan is a pure narrow map
    * (compose with the IVF cell join for the classic IVF-PQ when even
    * the scan is too big).
    *
    * Spark shape: the codebooks come back to the driver after training
    * (bounded m·k·subDim doubles) and are INLINED AS LITERALS — encoding
    * is the fused [[graft.functions.PqEncode]] argmin over the 32
    * literal centroids per subspace (the equivalent min(array<struct>)
    * tree overflows janino's 64 KB method limit at k=32), and ADC is a
    * literal-table lookup: the entire encode+score pipeline is a
    * zero-join, zero-shuffle projection over the corpus scan, followed
    * only by the per-query top-k window.
    * Determinism: dist² and ADC chains are fused [[graft.functions.DotProduct]]
    * loops (bit-identical to the oracle's left-associated chains),
    * quantized means are exact, ties break by cent_id / vec_id. */
  def pqTopK(embeddings: DataFrame, numQueries: Int = NumQueries,
      k: Int = PqCentroids, iters: Int = PqIters): DataFrame =
    pqServe(embeddings, pqCodebooks(embeddings, k, iters), numQueries, k)

  /** SERVE the PQ scan from already-trained per-subspace codebooks —
    * the query path alone, no training job (the [[ivfServe]] split for
    * the PQ half: the codebooks are PqSubspaces × k subvectors,
    * driver-sized by design, faiss ships them inside the index file).
    * [[pqPersistServe]] stores and restores them as a versioned
    * artifact. */
  def pqServe(embeddings: DataFrame, books: Seq[Seq[(Int, Array[Double])]],
      numQueries: Int = NumQueries, k: Int = PqCentroids): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = embeddings.select(col("vec_id"), col("embedding"))
    // per-subspace code via the fused native argmin
    // ([[graft.functions.PqEncode]]): the v·v term of the true distance
    // is constant per (vector, subspace) and dropped on BOTH engines
    val coded = (0 until PqSubspaces).foldLeft(n) { (d, j) =>
      d.withColumn(s"code_$j", pqEncodeCol(ss, subVec(col("embedding"), j), books(j)))
    }
    // the query set is bounded (vec_id < numQueries): collect it and
    // precompute the classic ADC LOOKUP TABLES on the driver —
    // lut[q][j][cent_id] = ⟨q_subⱼ, centroid⟩, the same left-associated
    // double chain as the oracle's SQL. Scoring then needs NO join at
    // all: explode the literal query-id list against the coded scan and
    // sum 8 literal-map lookups — scan → narrow map → top-k window.
    val qRows = n.filter(col("vec_id") < numQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val luts: Seq[Column] = (0 until PqSubspaces).map { j =>
      map(qRows.flatMap { case (qid, qv) =>
        val lut = Array.fill(k)(0.0)
        books(j).foreach { case (cid, ce) =>
          lut(cid) = leftDot(qv.map(_.toDouble).slice(j * PqSubDim, (j + 1) * PqSubDim), ce)
        }
        Seq(lit(qid), typedLit(lut.toSeq))
      }: _*)
    }
    val adc = (0 until PqSubspaces).map(j =>
      element_at(element_at(luts(j), col("query_id")), col(s"code_$j") + 1))
      .reduce(_ + _)
    val pairs = coded
      .withColumn("query_id", explode(typedLit(qRows.map(_._1).toSeq)))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", round(adc, 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("adc"))
  }

  /** PERSIST the trained PQ codebooks and serve the ADC scan WITHOUT
    * retraining — the PQ half of the [[ivfPersistServe]] story, same
    * protocol: train [[pqCodebooks]] once; store all PqSubspaces × k
    * subvector rows as ONE versioned artifact through
    * [[graft.streaming.VersionedSnapshot]] (`_SUCCESS`-gated versions
    * behind the `__latest` pointer); restore in a FRESH session;
    * [[pqServe]] from the restored books. The `ann_pq_persist` oracle
    * row hash-checks the served results against the same DuckDB
    * derivation as `ann_pq_topk` — restored codebooks ≡ in-session
    * codebooks, to the bit. */
  def pqPersistServe(embeddings: DataFrame, workDir: String,
      numQueries: Int = NumQueries, k: Int = PqCentroids,
      iters: Int = PqIters): DataFrame = {
    val ss = embeddings.sparkSession
    import ss.implicits._
    val books = pqCodebooks(embeddings, k, iters)
    val rows = for {
      (bj, j) <- books.zipWithIndex
      (cid, v) <- bj
    } yield (j, cid, v)
    val store = new graft.streaming.VersionedSnapshot(
      ss, java.nio.file.Paths.get(workDir, "pqbook"))
    store.write(1L, rows.toDF("subspace", "cell", "centroid"))
    val s2 = ss.newSession()
    val restoredRows = new graft.streaming.VersionedSnapshot(
      s2, java.nio.file.Paths.get(workDir, "pqbook"))
      .newestBelow(Long.MaxValue)
      .getOrElse(throw new IllegalStateException(
        s"no committed pq codebooks under $workDir/pqbook"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val restored = (0 until PqSubspaces).map { j =>
      restoredRows.filter(_._1 == j).map(t => (t._2, t._3)).sortBy(_._1).toSeq
    }
    pqServe(embeddings, restored, numQueries, k)
  }

  /** IVF × PQ — the production ANN shape at corpus scale (Jégou et al.
    * '11 §IV): the coarse quantizer ([[ivfCentroids]]) restricts each
    * query to its own cell, and within the cell the ADC score runs over
    * PQ CODES, not raw vectors. At 100 TB both factors matter
    * independently: IVF divides the scan by the cell count, PQ divides
    * the bytes per scanned vector by ~32× — together the probe touches
    * cells/k of the corpus at 8 code bytes per vector.
    *
    * Spark shape: cell assignment and per-subspace coding are the same
    * fused-literal narrow maps as the halves ([[graft.functions.PqEncode]]
    * against driver-trained books); the query set is bounded, so its
    * cells come back with ONE tiny collect and the probe is a zero-join
    * projection — filter the coded scan to the queries' cells (literal
    * IN), explode the literal query list, keep cell-matched rows, sum 8
    * literal-LUT lookups, per-query top-1 window. Same determinism
    * contract as both halves (quantized means, dropped-v·v argmin,
    * round(·,4), ties by vec_id). */
  def ivfPqTopK(embeddings: DataFrame, numCentroids: Int = NumCentroids,
      numQueries: Int = NumQueries, ivfIters: Int = KMeansIters,
      pqK: Int = PqCentroids, pqIters: Int = PqIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val coarse = ivfCentroids(embeddings, numCentroids, ivfIters)
    val books = pqCodebooks(embeddings, pqK, pqIters)
    val n = embeddings.select(col("vec_id"), col("embedding"))
    val celled = n.withColumn("cell", pqEncodeCol(ss, col("embedding"), coarse))
    val coded = (0 until PqSubspaces).foldLeft(celled) { (d, j) =>
      d.withColumn(s"code_$j", pqEncodeCol(ss, subVec(col("embedding"), j), books(j)))
    }
    // queries + their cells via the SAME in-plan assignment the corpus
    // gets (one bounded collect — no second argmin implementation to
    // drift from the fused loop)
    val qRows = celled.filter(col("vec_id") < numQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    val qCellOf: Column = map(qRows.flatMap { case (qid, _, cell) =>
      Seq(lit(qid), lit(cell)) }: _*)
    val luts: Seq[Column] = (0 until PqSubspaces).map { j =>
      map(qRows.flatMap { case (qid, qv, _) =>
        val lut = Array.fill(pqK)(0.0)
        books(j).foreach { case (cid, ce) =>
          lut(cid) = leftDot(qv.map(_.toDouble).slice(j * PqSubDim, (j + 1) * PqSubDim), ce)
        }
        Seq(lit(qid), typedLit(lut.toSeq))
      }: _*)
    }
    val adc = (0 until PqSubspaces).map(j =>
      element_at(element_at(luts(j), col("query_id")), col(s"code_$j") + 1))
      .reduce(_ + _)
    val probedCells = qRows.map(_._3).distinct.sorted
    val pairs = coded
      .filter(col("cell").isin(probedCells: _*)) // cells/k of the corpus
      .withColumn("query_id", explode(typedLit(qRows.map(_._1).toSeq)))
      .filter(col("cell") === element_at(qCellOf, col("query_id")) &&
        col("vec_id") =!= col("query_id"))
      .withColumn("adc", round(adc, 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("adc"))
  }

  /** Filtered vector search — exact cosine top-k restricted to corpus
    * rows satisfying a metadata predicate (the production "ANN + WHERE
    * label = X" shape: RAG over a tenant/language/source slice). The
    * predicate is applied BEFORE scoring, so Catalyst pushes it into the
    * parquet scan (pre-filtering, not post-filtering — post-filtering
    * top-k can return < k rows and wastes score work at 100 TB). Same
    * broadcast-queries / corpus-scan / top-k-window shape and determinism
    * contract as [[cosineTopK]]; queries themselves are NOT subject to
    * the predicate (you search a slice on behalf of any query). */
  def filteredCosineTopK(embeddings: DataFrame, predicate: Column,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val q = broadcast(withNorm(embeddings.select(col("vec_id"), col("embedding")))
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn")))
    val corpus = withNorm(embeddings.filter(predicate)
      .select(col("vec_id"), col("embedding")))
    val pairs = corpus.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** ANN quality evaluation — the recall harness every production
    * vector-search deployment runs before trusting an approximate path:
    * score the bucketed-LSH top-1 ([[lshTopK]]) against the exact cosine
    * top-k ([[cosineTopK]]) and report, in ONE row, how many queries the
    * approximate path answered and how many answers land in the exact
    * top-k. recall = n_hits / n_queries (missing-bucket no-answers count
    * as misses — the honest denominator).
    *
    * Scale shape: both sides inherit their operators' audited plans
    * (broadcast queries, bucket equi-join / corpus scan + top-k window);
    * the comparison is a semi-join on (query_id, vec_id) over ≤
    * numQueries·k rows and the final aggregate is a 1-row reduce —
    * evaluation cost is dominated by the exact baseline, which is the
    * point of sampling numQueries queries rather than all of them. */
  def lshRecall(embeddings: DataFrame, planes: Int = Planes,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame =
    recallAgainstExact(embeddings,
      lshTopK(embeddings, planes, numQueries), k, numQueries)

  /** The recall harness over the multi-probe path — the measurement
    * that JUSTIFIES the dial: same hash family as [[lshRecall]], so the
    * recall delta between the two rows is exactly what probing the
    * Hamming-1 buckets buys at (planes+1)× probe volume. */
  def lshMultiprobeRecall(embeddings: DataFrame, planes: Int = Planes,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame =
    recallAgainstExact(embeddings,
      lshMultiprobeTopK(embeddings, planes, numQueries), k, numQueries)

  /** The same recall harness over the composed IVF×PQ production path:
    * how often does the cell-restricted ADC winner land in the exact
    * top-k? The eval run that justifies (or vetoes) shipping the
    * approximate index. */
  def ivfPqRecall(embeddings: DataFrame, k: Int = TopK,
      numQueries: Int = NumQueries): DataFrame =
    recallAgainstExact(embeddings, ivfPqTopK(embeddings), k, numQueries)

  /** Dimensions kept by [[truncatedRecall]] — the Matryoshka prefix.
    * This corpus's dims are i.i.d. synthetic (no MRL-style prefix
    * concentration), so the top-1-in-top-3 dial reads 0.0 / 0.2 / 0.5 /
    * 0.8 at 16 / 32 / 48 / 56 dims; 48 pins the mid-dial, where the
    * measurement is unambiguously load-bearing in both directions. */
  val TruncDims = 48

  /** Exact top-1 cosine neighbor per query using only the first `dims`
    * embedding dimensions — the Matryoshka/truncation retrieval mode
    * (Kusupati et al. '22): prefix dimensions carry most of the signal,
    * so searching 16 of 64 dims costs a quarter of the memory bandwidth
    * and FLOPs. Same broadcast-query scan shape as [[cosineTopK]]; the
    * truncation is a `slice` before the fused dot, so the scan reads
    * the full column but the arithmetic shrinks (a column layout that
    * SPLITS prefix dims into their own file would shrink I/O too). */
  def truncatedTopK(embeddings: DataFrame, dims: Int = TruncDims,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims >= 1 && dims <= Dim, s"dims must be in [1, $Dim], got $dims")
    val ss = embeddings.sparkSession
    val n = embeddings.select(col("vec_id"), slice(col("embedding"), 1, dims).as("te"))
      .withColumn("tn", sqrt(dot(ss, col("te"), col("te"))))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("te").as("qe"), col("tn").as("qn")))
    val pairs = n.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("te")) / (col("qn") * col("tn")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** The recall harness over dimension truncation: does the `dims`-dim
    * (default [[TruncDims]] = 48 of 64) prefix's top-1 land in the
    * full-precision top-k? The measurement
    * that justifies (or vetoes) shipping truncated embeddings — the
    * memory-reduction twin of the PQ recall row. */
  def truncatedRecall(embeddings: DataFrame, dims: Int = TruncDims,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame =
    recallAgainstExact(embeddings, truncatedTopK(embeddings, dims, numQueries),
      k, numQueries)

  /** Hard-negative mining for contrastive training (the batch-mining
    * step of every embedding-model pipeline): for each query vector,
    * the `k` most-similar corpus vectors with a DIFFERENT label — the
    * confusable non-matches whose gradients actually move the model
    * (random negatives are trivially separable). Same broadcast-query
    * corpus scan as [[cosineTopK]] with the label-mismatch predicate in
    * the join condition, so mismatches prune before any similarity
    * arithmetic. Returns (query_id, query label, negative id, its
    * label, sim). */
  def hardNegatives(embeddings: DataFrame, k: Int = TopK,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding"), col("label")))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("q_label")))
    val pairs = n.join(q, col("label") =!= col("q_label"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("q_label"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"), col("sim"))
  }

  /** Shared recall evaluator: any approximate (query_id, vec_id) answer
    * set scored against the exact cosine top-k (see [[lshRecall]] for
    * the contract — no-answers count as misses). */
  private def recallAgainstExact(embeddings: DataFrame, approxAnswers: DataFrame,
      k: Int, numQueries: Int): DataFrame = {
    val approx = approxAnswers.select(col("query_id"), col("vec_id"))
    val exact = cosineTopK(embeddings, k, numQueries)
      .select(col("query_id"), col("vec_id"))
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
    approx.agg(count(lit(1)).as("n_answered"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(
        lit(numQueries.toLong).as("n_queries"),
        col("n_answered"),
        col("n_hits"),
        round(col("n_hits").cast("double") / numQueries, 4).as("recall"))
  }

  /** Left-associated driver-side dot — bit-identical to the fused
    * [[graft.functions.DotProduct]] loop and the oracle's SQL chains. */
  private def leftDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The fused PQ-encode argmin over a driver-side codebook, with the
    * codebook and cent_ids inlined as literals. */
  private def pqEncodeCol(ss: org.apache.spark.sql.SparkSession, sub: Column,
      book: Seq[(Int, Array[Double])]): Column =
    graft.functions.Functions.pqEncode(ss, sub,
      typedLit(book.map(_._2.toSeq)), typedLit(book.map(_._1)))

  /** Approximate nearest neighbor: for each query vector, the best
    * same-bucket neighbor by cosine. The join key is the bucket id —
    * the bucketed scale path (recall < 1 by construction; add planes or
    * probe neighboring buckets to trade recall vs. cost). */
  def lshTopK(embeddings: DataFrame, planes: Int = Planes,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
      .withColumn("bucket", bucket(col("embedding"), planes))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qb")))
    val pairs = n.join(q, col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** Bits per sign word ([[signWord]]): signatures are packed as TWO
    * 32-bit words in a BIGINT rather than one 64-bit word because a
    * `1 << 63` literal overflows the oracle engine's signed shift; the
    * split costs one extra xor+popcount per comparison and nothing
    * else. */
  val WordBits = 32
  /** Hamming shortlist kept per query before the exact-cosine rerank
    * ([[hammingRerankTopK]]) — the standard binary-quantization dial:
    * larger shortlists buy recall at rerank-fetch cost. */
  val HammingShortlist = 16

  /** One sign word of the embedding (word 0 covers dims 1–32, word 1
    * dims 33–64): bit (i−1) is set iff element (word·32+i) ≥ 0 — the
    * binary quantization of Jégou et al.-style sign codes. The chain is
    * integer addition of distinct powers of two: order-independent,
    * exact, and bit-identical in any engine (the float ≥ 0 test has no
    * rounding to disagree on). */
  def signWord(e: Column, word: Int): Column = {
    require(word == 0 || word == 1, s"word must be 0 or 1, got $word")
    (1 to WordBits).map(i =>
      when(element_at(e, word * WordBits + i) >= 0, lit(1L << (i - 1)))
        .otherwise(lit(0L)))
      .reduce(_ + _)
  }

  private def withSignWords(df: DataFrame): DataFrame =
    df.withColumn("w0", signWord(col("embedding"), 0))
      .withColumn("w1", signWord(col("embedding"), 1))

  /** Binary-quantized search: top-k by Hamming distance between 64-bit
    * sign signatures (two xor+popcount per comparison). This is the
    * memory-bandwidth scale path for a first-pass scan — at 100 TB the
    * signature table is 8 bytes/vector (32× smaller than the float
    * corpus), so the brute scan that is I/O-bound on raw embeddings
    * becomes cache-resident here; production systems precompute the
    * signature column at ingest, which is exactly the narrow
    * [[signWord]] map. Same broadcast-queries / corpus-scan / top-k
    * window shape as [[cosineTopK]]; ties break by vec_id. */
  def hammingTopK(embeddings: DataFrame, k: Int = TopK,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = withSignWords(embeddings.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), col("w0"), col("w1"))
    val q = broadcast(sig.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("w0").as("q0"), col("w1").as("q1")))
    val pairs = sig.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("hamming",
        (bit_count(col("q0").bitwiseXOR(col("w0"))) +
          bit_count(col("q1").bitwiseXOR(col("w1")))).cast("long"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("hamming"), col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("hamming"))
  }

  /** The production binary-quantization pattern: Hamming-shortlist
    * `shortlist` candidates per query over the 8-byte signatures, then
    * fetch ONLY the shortlisted float vectors and rerank by exact
    * cosine, keeping top-k. The plan mirrors the deployment shape: the
    * signature scan and its top-shortlist window move 24-byte rows; the
    * float corpus is touched again only by the broadcast join of
    * shortlist·numQueries candidate ids back onto it (the "fetch" —
    * at 100 TB this is the difference between streaming 100 TB of
    * floats and streaming 3 TB of signatures plus point reads). */
  def hammingRerankTopK(embeddings: DataFrame, shortlist: Int = HammingShortlist,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val cand = hammingTopK(embeddings, shortlist, numQueries)
      .select(col("query_id"), col("vec_id"))
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn")))
    val fetched = n.join(broadcast(cand), Seq("vec_id")).join(q, Seq("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    fetched.withColumn("rn", row_number().over(wr)).filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }

  /** Recall harness for the binary-quantized path: the Hamming-shortlist
    * + exact-rerank top-k ([[hammingRerankTopK]]) scored against the
    * exact cosine top-k, edge-for-edge (the @k twin of [[knnRecall]]'s
    * summary shape — denominator is the full numQueries·k truth set).
    * The number that says whether 8-byte signatures plus a `shortlist`-
    * row fetch preserve the float ranking before you ship them. */
  def hammingRecall(embeddings: DataFrame, shortlist: Int = HammingShortlist,
      k: Int = TopK, numQueries: Int = NumQueries): DataFrame = {
    val approx = hammingRerankTopK(embeddings, shortlist, k, numQueries)
      .select(col("query_id"), col("vec_id"), lit(true).as("__hit"))
    val exact = cosineTopK(embeddings, k, numQueries)
      .select(col("query_id"), col("vec_id"))
    exact.join(approx, Seq("query_id", "vec_id"), "left_outer")
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hits"))
      .select(col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 4).as("recall"))
  }

  /** Multi-probe LSH top-1 (Lv et al. '07): each query probes its own
    * bucket PLUS every Hamming-distance-1 bucket (one sign bit flipped)
    * — the standard recall/cost dial for sign-LSH. A near neighbor that
    * fell just across one hyperplane is recovered without adding tables
    * or re-hashing the corpus: probe volume is (planes+1) rows per
    * query, exploded on the broadcast (small) side only, while every
    * corpus vector still carries exactly ONE bucket id and never leaves
    * it. Probe buckets are distinct by construction, so no candidate
    * pair appears twice and no dedup pass is needed. */
  def lshMultiprobeTopK(embeddings: DataFrame, planes: Int = Planes,
      numQueries: Int = NumQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = embeddings.sparkSession
    val n = withNorm(embeddings.select(col("vec_id"), col("embedding")))
      .withColumn("bucket", bucket(col("embedding"), planes))
    val probeSet = array(col("qb") +: (0 until planes).map(i =>
      col("qb").bitwiseXOR(lit(1 << i))): _*)
    val q = broadcast(n.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qb"))
      .withColumn("pb", explode(probeSet)))
    val pairs = n.join(q, col("bucket") === col("pb") && col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(dot(ss, col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1)
      .select(col("query_id"), col("vec_id"), col("sim"))
  }
}
