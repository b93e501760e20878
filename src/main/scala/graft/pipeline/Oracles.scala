package graft.pipeline

/** DuckDB oracle SQL for the pipeline queries, GENERATED from the same
  * constants the Spark operators use ([[Dedup]], [[Ann]],
  * [[TextPipeline]]) so the two sides cannot drift: hash counts, band
  * geometry, thresholds, stopword lists, and the LSH hyperplane literals
  * are all single-sourced.
  *
  * Dialect mapping (Spark → DuckDB): split → regexp_split_to_array,
  * transform/filter → list_transform/list_filter, array_min → list_min,
  * array_intersect/union → list_intersect / list_distinct(a||b),
  * regexp_replace(all) → regexp_replace(..., 'g'); md5/sqrt/round/instr
  * are shared. Arithmetic chains are emitted left-associated on both
  * sides for bit-identical IEEE evaluation.
  */
object Oracles {

  /** words CTE + distinct word-3-gram shingle CTE over documents. */
  private val shingleCtes: String =
    """w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |s AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN []
      |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS sh FROM w)"""
      .stripMargin

  private val sigCte: String =
    s"g AS (SELECT doc_id, sh, list_transform(range(0, ${Dedup.NumHashes}), " +
      "i -> list_min(list_transform(sh, x -> md5(i::VARCHAR || '|' || x)))) AS mh FROM s)"

  val dedupExact: String =
    "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text"

  /** Rebuilds graft.hashing's canonical tuple encoding (attrs sorted by
    * name, `name:tag:utf8ByteLen:value` joined with ';', relName prefix)
    * in SQL and sha-256s it — the oracle for row-hash-keyed dedup. */
  val dedupExactHash: String = {
    val keyCols = Seq("lang", "source", "text") // sorted attribute order
    val enc = keyCols.zipWithIndex.map { case (c, i) =>
      val sep = if (i == 0) "" else ";"
      s"'$sep$c:s:' || octet_length(encode($c)) || ':' || $c"
    }.mkString(" || ")
    s"SELECT sha256('documents|' || $enc) AS content_hash, " +
      "min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY 1"
  }

  val dedupMinhashSig: String = {
    val bandCols = (0 until Dedup.NumBands).map { b =>
      val parts = (1 to Dedup.RowsPerBand).map(r => s"mh[${b * Dedup.RowsPerBand + r}]").mkString(" || ")
      s"md5($parts) AS b$b"
    }.mkString(", ")
    s"WITH $shingleCtes, $sigCte SELECT doc_id, $bandCols FROM g"
  }

  private val bandsCte: String = {
    val parts = (1 to Dedup.RowsPerBand).map(r => s"mh[${Dedup.RowsPerBand}*b + $r]").mkString(" || ")
    s"bands AS (SELECT doc_id, b, md5($parts) AS bh FROM g, unnest(range(0, ${Dedup.NumBands})) AS t(b))"
  }

  /** Band-collision candidates + exact-Jaccard verification, shared by
    * the pair and cluster oracles. */
  private val pairCtes: String =
    s"""cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |        round(len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
       |      FROM cand JOIN s sa ON sa.doc_id = cand.doc_a JOIN s sb ON sb.doc_id = cand.doc_b)"""
      .stripMargin

  val dedupMinhashPairs: String =
    s"""WITH $shingleCtes, $sigCte, $bandsCte, $pairCtes
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= ${Dedup.JaccardThreshold}"""
      .stripMargin

  /** Connected components of the verified near-dup pair graph via a
    * recursive transitive closure: reach(id, rid) accumulates every node
    * reachable from id (UNION dedup terminates it), min(rid) is the
    * cluster label — the oracle mirror of [[Dedup.clustersFromPairs]]'s
    * min-label propagation fixpoint. */
  val dedupClusters: String =
    s"""WITH RECURSIVE $shingleCtes, $sigCte, $bandsCte, $pairCtes,
       |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= ${Dedup.JaccardThreshold}),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (SELECT doc_id AS id, doc_id AS rid FROM documents
       |          UNION
       |          SELECT r.id, e.dst AS rid FROM reach r JOIN e ON e.src = r.rid)
       |SELECT id AS doc_id, min(rid) AS cluster_id FROM reach GROUP BY id"""
      .stripMargin

  /** Repetition ratios over NON-distinct token/3-gram lists (the gram CTE
    * deliberately skips list_distinct — multiplicity is the signal). */
  val textRepetition: String =
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
       |g AS (SELECT doc_id, ws, CASE WHEN len(ws) < 3 THEN []
       |       ELSE list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS grams FROM w)
       |SELECT doc_id, len(ws)::BIGINT AS n_tokens,
       |  round(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 4) AS dup_token_ratio,
       |  len(grams)::BIGINT AS n_grams,
       |  CASE WHEN len(grams) > 0
       |    THEN round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4)
       |    ELSE 0.0 END AS dup_gram_ratio
       |FROM g"""
      .stripMargin

  /** Contamination flags between the doc_id % 50 = 0 "benchmark" slice
    * and the rest of the corpus: shared distinct-shingle counts via the
    * same inverted-index join the Spark operator uses. */
  def textContamination(minOverlap: Int): String =
    s"""WITH $shingleCtes,
       |inv_c AS (SELECT doc_id, unnest(sh) AS shingle FROM s WHERE doc_id % 50 <> 0),
       |inv_b AS (SELECT doc_id AS bench_id, unnest(sh) AS shingle FROM s WHERE doc_id % 50 = 0)
       |SELECT c.doc_id, b.bench_id, count(*) AS n_shared
       |FROM inv_c c JOIN inv_b b USING (shingle)
       |GROUP BY 1, 2 HAVING count(*) >= $minOverlap"""
      .stripMargin

  /** Stable hash-bucket split, constants single-sourced from [[Splits]];
    * lowercase-hex buckets compare lexically = numerically. */
  val splitAssign: String =
    s"""WITH b AS (SELECT *, substr(sha256(doc_id::VARCHAR || '|${Splits.DefaultSalt}'), 1, 2) AS bucket
       |          FROM documents)
       |SELECT *, CASE WHEN bucket < '${Splits.TrainUpper}' THEN 'train'
       |  WHEN bucket < '${Splits.ValUpper}' THEN 'val' ELSE 'test' END AS split FROM b"""
      .stripMargin

  def dedupJaccardPairs(threshold: Double): String =
    s"""WITH $shingleCtes,
       |sizes AS (SELECT doc_id, len(sh) AS n FROM s),
       |inv AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |co AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |       FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |j AS (SELECT doc_a, doc_b, round(inter::DOUBLE / (na.n + nb.n - inter), 4) AS jaccard
       |      FROM co JOIN sizes na ON na.doc_id = co.doc_a JOIN sizes nb ON nb.doc_id = co.doc_b)
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $threshold"""
      .stripMargin

  lazy val dedupSimhash: String =
    s"WITH $simhashCtes SELECT doc_id, simhash FROM fp"

  /** Token→nibble→bit-score pipeline shared by the simhash queries
    * (lazy: referenced by vals textually above this definition). */
  private lazy val simhashCtes: String = {
    val vCols = (0 until 16).map(p =>
      s"instr('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1 AS v$p").mkString(", ")
    val sCols = (0 until 64).map { k =>
      s"sum(CASE WHEN ((v${k / 4} >> ${3 - k % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s$k"
    }.mkString(", ")
    val nCols = (0 until 16).map { p =>
      val terms = (0 until 4).map { j =>
        s"(CASE WHEN s${4 * p + j} > 0 THEN ${8 >> j} ELSE 0 END)"
      }.mkString(" + ")
      s"$terms AS n$p"
    }.mkString(", ")
    val hexChars = (0 until 16).map(p => s"substr('0123456789abcdef', n$p + 1, 1)").mkString(" || ")
    s"""tok AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS token FROM documents),
       |h AS (SELECT doc_id, substr(md5(token), 1, 16) AS h FROM tok),
       |v AS (SELECT doc_id, $vCols FROM h),
       |sc AS (SELECT doc_id, $sCols FROM v GROUP BY doc_id),
       |n AS (SELECT doc_id, $nCols FROM sc),
       |fp AS (SELECT doc_id, $hexChars AS simhash FROM n)"""
      .stripMargin
  }

  lazy val dedupSimhashPairs: String = {
    val ham = (0 until 16).map { p =>
      s"bit_count(xor(instr('0123456789abcdef', substr(sa, ${p + 1}, 1)) - 1, " +
        s"instr('0123456789abcdef', substr(sb, ${p + 1}, 1)) - 1))"
    }.mkString(" + ")
    s"""WITH $simhashCtes,
       |blk AS (SELECT doc_id, simhash, b, substr(simhash, 1 + 4*b, 4) AS blockv
       |        FROM fp, unnest(range(0, ${Dedup.SimhashBlocks})) AS t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                a.simhash AS sa, b.simhash AS sb
       |         FROM blk a JOIN blk b ON a.b = b.b AND a.blockv = b.blockv AND a.doc_id < b.doc_id),
       |hd AS (SELECT doc_a, doc_b, ($ham)::BIGINT AS hamming FROM cand)
       |SELECT doc_a, doc_b, hamming FROM hd WHERE hamming <= ${Dedup.MaxHamming}"""
      .stripMargin
  }

  val textTokenStats: String =
    """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
      |SELECT doc_id, len(ws) AS n_tokens, len(list_distinct(ws)) AS n_distinct,
      |       round(len(list_distinct(ws))::DOUBLE / len(ws), 4) AS ttr FROM w"""
      .stripMargin

  private def inList(words: Seq[String]): String = words.map(w => s"'$w'").mkString("(", ", ", ")")

  val textQuality: String = {
    val stops = inList(TextPipeline.LangProfiles.head._2)
    s"""WITH w AS (SELECT doc_id, trim(text) AS t, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
       |q AS (SELECT doc_id, length(t) AS n_chars, len(ws) AS n_tokens,
       |        round(len(list_filter(ws, x -> x IN $stops))::DOUBLE / len(ws), 4) AS stop_ratio,
       |        round(length(regexp_replace(t, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(t), 4) AS punct_ratio,
       |        round(length(replace(t, ' ', ''))::DOUBLE / len(ws), 4) AS mean_tok_len
       |      FROM w)
       |SELECT doc_id, n_chars, n_tokens, stop_ratio, punct_ratio, mean_tok_len,
       |       round(0.6 * stop_ratio + 0.04 * least(mean_tok_len, 10.0)
       |             + 0.2 * (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1.0 ELSE 0.0 END), 4) AS score
       |FROM q"""
      .stripMargin
  }

  val textLangId: String = {
    val langs = TextPipeline.LangProfiles.map(_._1)
    val scoreCols = TextPipeline.LangProfiles.map { case (lang, words) =>
      s"len(list_filter(ws, x -> x IN ${inList(words)})) AS s_$lang"
    }.mkString(", ")
    val pred = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") { case ((lang, i), els) =>
      val beats = langs.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"CASE WHEN $beats THEN '$lang' ELSE $els END"
    }
    s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
       |sc AS (SELECT doc_id, $scoreCols FROM w)
       |SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")}, $pred AS pred_lang FROM sc"""
      .stripMargin
  }

  val textFingerprint: String =
    s"""WITH $shingleCtes,
       |n AS (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM documents)
       |SELECT n.doc_id, md5(n.norm) AS fp_full,
       |       list_min(list_transform(s.sh, x -> md5(x))) AS fp_min
       |FROM n JOIN s ON s.doc_id = n.doc_id"""
      .stripMargin

  val mmPayloadStats: String =
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS checksum, source FROM documents"

  // ---- ANN: explicit left-associated chains (see Ann scaladoc) ----

  private def dotChainSql(a: String, b: String): String =
    (1 to Ann.Dim).map(i => s"$a[$i]::DOUBLE * $b[$i]::DOUBLE").mkString(" + ")

  private val normCte: String =
    s"n AS (SELECT vec_id, embedding, sqrt(${dotChainSql("embedding", "embedding")}) AS nrm FROM embeddings)"

  val annCosineTopK: String =
    s"""WITH $normCte,
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |        round((${dotChainSql("q.embedding", "c.embedding")}) / (q.nrm * c.nrm), 4) AS sim
       |      FROM n q JOIN n c ON q.vec_id < ${Ann.NumQueries} AND c.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn FROM p)
       |SELECT query_id, vec_id, sim FROM r WHERE rn <= ${Ann.TopK}"""
      .stripMargin

  /** Bucket expression with the hyperplane weights inlined as literals —
    * the same literals [[Ann.planeWeight]] feeds the Spark plan. */
  private val bucketSql: String =
    (0 until Ann.Planes).map { j =>
      val chain = (1 to Ann.Dim).map(i => s"${Ann.planeWeight(j, i - 1)} * embedding[$i]::DOUBLE").mkString(" + ")
      s"(CASE WHEN $chain > 0 THEN ${1 << (Ann.Planes - 1 - j)} ELSE 0 END)"
    }.mkString(" + ")

  val annLshBuckets: String =
    s"""WITH b AS (SELECT vec_id, $bucketSql AS bucket FROM embeddings)
       |SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec FROM b GROUP BY bucket"""
      .stripMargin

  val dedupEmbeddingPairs: String =
    s"""WITH n AS (SELECT vec_id, embedding, sqrt(${dotChainSql("embedding", "embedding")}) AS nrm,
       |             $bucketSql AS bucket FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round((${dotChainSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 4) AS sim
       |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round((${dotChainSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm), 4) >= ${Ann.CosineDupThreshold}"""
      .stripMargin

  val annIvfTopK: String =
    s"""WITH n AS (SELECT vec_id, embedding, sqrt(${dotChainSql("embedding", "embedding")}) AS nrm FROM embeddings),
       |c AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < ${Ann.NumCentroids}),
       |d AS (SELECT n.vec_id, c.cent_id,
       |        ((${dotChainSql("n.embedding", "n.embedding")}) + (${dotChainSql("c.ce", "c.ce")}))
       |          - (2.0 * (${dotChainSql("n.embedding", "c.ce")})) AS dist2
       |      FROM n, c),
       |asg AS (SELECT vec_id, cent_id AS cell FROM
       |         (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cent_id) AS rn FROM d)
       |        WHERE rn = 1),
       |p AS (SELECT q.vec_id AS query_id, x.vec_id AS vec_id,
       |        round((${dotChainSql("q.embedding", "x.embedding")}) / (q.nrm * x.nrm), 4) AS sim
       |      FROM n q JOIN asg qa ON qa.vec_id = q.vec_id
       |      JOIN asg xa ON xa.cell = qa.cell
       |      JOIN n x ON x.vec_id = xa.vec_id
       |      WHERE q.vec_id < ${Ann.NumQueries} AND x.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn FROM p)
       |SELECT query_id, vec_id, sim FROM r WHERE rn <= 1"""
      .stripMargin

  val annLshTopK: String =
    s"""WITH n AS (SELECT vec_id, embedding, sqrt(${dotChainSql("embedding", "embedding")}) AS nrm,
       |             $bucketSql AS bucket FROM embeddings),
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |        round((${dotChainSql("q.embedding", "c.embedding")}) / (q.nrm * c.nrm), 4) AS sim
       |      FROM n q JOIN n c ON q.vec_id < ${Ann.NumQueries} AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn FROM p)
       |SELECT query_id, vec_id, sim FROM r WHERE rn <= 1"""
      .stripMargin
}
