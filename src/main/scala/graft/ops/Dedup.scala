package graft.ops

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (training-data pipeline).
  *
  * All near-dup variants follow the same scale shape: per-row signature
  * (narrow) → candidate generation by bucket equi-join (shuffle on small
  * keys, never all-pairs) → exact verification on candidates only. At 100 TB
  * the all-pairs comparison is impossible; the bucket join is linear in
  * candidates and AQE handles hot buckets.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup by content hash: one row per distinct text with the minimum
    * id as representative and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Ids to drop under exact dedup (everything but the representative). */
  def exactDropList(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") > 1)
      .select(col(idCol)).withColumnRenamed(idCol, "drop_id")
  }

  // ---------- token / n-gram helpers ----------

  private def tokensCol(textCol: String) =
    array_remove(split(lower(col(textCol)), "[^a-z0-9]+"), "")

  /** Word n-gram (shingle) array via sequence/transform — codegen'd, no UDF. */
  private def shinglesCol(textCol: String, n: Int) = {
    val t = tokensCol(textCol)
    when(size(t) < n, array())
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + lit(1), lit(n)), " ")))
  }

  // ---------- exact n-gram Jaccard ----------

  /** Near-duplicate pairs by exact Jaccard over distinct word n-grams:
    * explode → equi-join on shingle → |∩| per pair → |A∪B| from per-doc set
    * sizes. Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ th.
    *
    * SCALE NOTE: this is the EXACT path — a shingle appearing in d documents
    * contributes O(d²) join rows, so a hot shingle (stop-word unigram at
    * n=1) makes it quadratic. At corpus scale route through
    * [[minhashLshPairs]] (bucketed candidates + exact verification) and keep
    * this as the small-N oracle / verifier it is here.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // per-doc set size is size(array_distinct(...)) — a NARROW projection,
    // not the former explode + groupBy + shuffle re-derivation of the same
    // number (guide §2.4: a distinct on data derivable without a shuffle).
    // The pair aggregation keeps its original narrow (id_a, id_b) grouping
    // key: carrying the sizes THROUGH the hot candidate join was measured
    // ~40% slower (every join-output row pays the wider agg key), so sizes
    // re-attach afterwards on the ~|pairs| aggregated rows via broadcast.
    val sh = docs.select(col(idCol).as("id"),
        explode(array_distinct(shinglesCol(textCol, n))).as("shingle"))
    // ONE broadcast of the sizes relation joined twice through dataset
    // aliases (per-side renaming projections would defeat broadcast-exchange
    // reuse and evaluate the shingle expression twice more)
    val sizes = broadcast(docs.select(col(idCol).as("vid"),
      size(array_distinct(shinglesCol(textCol, n))).as("sz")))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("va"), col("id_a") === col("va.vid"))
      .join(sizes.as("vb"), col("id_b") === col("vb.vid"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("va.sz") + col("vb.sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-duplicate pairs by exact n-gram CONTAINMENT — |A∩B| / min(|A|,|B|)
    * (Broder 1997's containment coefficient): catches a short document
    * quoted wholesale inside a long one, where Jaccard dilutes below any
    * usable threshold (|A∩B|/|A∪B| → |A|/|B| for A ⊂ B). Returns
    * (id_a, id_b, inter, sz_a, sz_b, containment) with id_a < id_b.
    * Same exact-path scale caveat as [[ngramJaccardPairs]] — corpus scale
    * routes through [[minhashLshPairs]] candidates, this is the small-N
    * oracle / verifier.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int = 2,
      threshold: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // same narrow-sizes + single-broadcast shape as [[ngramJaccardPairs]]:
    // sizes from a narrow projection (no explode+groupBy shuffle), ONE
    // broadcast joined twice via dataset aliases (exchange reuse)
    val sh = docs.select(col(idCol).as("id"),
        explode(array_distinct(shinglesCol(textCol, n))).as("shingle"))
    val sizes = broadcast(docs.select(col(idCol).as("vid"),
      size(array_distinct(shinglesCol(textCol, n))).as("sz")))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("va"), col("id_a") === col("va.vid"))
      .join(sizes.as("vb"), col("id_b") === col("vb.vid"))
      .select(col("id_a"), col("id_b"), col("inter"),
        col("va.sz").as("sz_a"), col("vb.sz").as("sz_b"),
        (col("inter").cast("double") / least(col("va.sz"), col("vb.sz")))
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Re-verify emitted near-dup pairs against the COLUMN-EXPRESSION shingle
    * path (the arithmetic [[ngramJaccardPairs]] uses — independent of the
    * Scala-UDF shingle path inside [[minhashLshPairs]]'s own verify step).
    * Joins the pair set back to the docs and appends `jaccard_recomputed`;
    * callers assert threshold/agreement (the driver's empty-relation
    * `dedup_minhash_check` row).
    */
  def verifyPairsExact(docs: DataFrame, pairs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(shinglesCol(textCol, n)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard_recomputed",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .drop("sh_a", "sh_b", "inter")
  }

  // ---------- MinHash + LSH ----------

  /** k minhash values over word n-gram shingles (deterministic seeds). */
  private[ops] def minhashSig(tokens: Seq[String], n: Int, k: Int): Array[Int] = {
    val sig = Array.fill(k)(Int.MaxValue)
    if (tokens.length >= n) {
      var i = 0
      while (i + n <= tokens.length) {
        val shingle = tokens.slice(i, i + n).mkString(" ")
        var j = 0
        while (j < k) {
          val h = MurmurHash3.stringHash(shingle, j * 0x85ebca6b + 0x1b873593)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
        i += 1
      }
    }
    sig
  }

  /** MinHash-LSH near-dup pairs: k-signature → b bands of r rows → bucket
    * join on (band, hash(band slice)) → verify Jaccard ≥ threshold on the
    * candidates. North-star blocking strategy: candidates come from an
    * equi-join, never all-pairs.
    *
    * `verifyExact` (default): candidates carry their distinct-shingle sets
    * and are verified with EXACT Jaccard — precision 1.0, recall limited
    * only by banding (1-(1-j^r)^b). With `verifyExact = false` the cheaper
    * signature-agreement estimate is used (±1/√k noise near the threshold;
    * measured at k=32/th=0.7: P≈R≈0.85 vs exact).
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, verifyExact: Boolean = true,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sigUdf = udf { (text: String) =>
      val toks = if (text == null) Seq.empty[String]
        else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      minhashSig(toks, n, k)
    }
    val shinglesUdf = udf { (text: String) =>
      val toks = if (text == null) Seq.empty[String]
        else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      if (toks.length < n) Seq.empty[String]
      else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
    }
    val sigs = docs.select(col(idCol).as("id"), sigUdf(col(textCol)).as("sig"))
      .filter(element_at(col("sig"), 1) =!= Int.MaxValue) // too short → no shingles

    // band rows carry ONLY (id, band, bucket) — 12 bytes/row, not the per-doc
    // shingle set ×bands. Verification payloads (shingle sets / signatures)
    // are joined back onto the ~linear candidate set afterwards, keyed by id,
    // so the corpus's distinct shingles shuffle once per join side instead of
    // `bands` times through the bucket self-join.
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + lit(1), lit(rows)), b))).as(Seq("band", "bucket")))
      .select(col("id"), col("band"), col("bucket"))

    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Both verify variants attach a per-id payload to BOTH pair sides. The
    // payload relation is broadcast ONCE and joined twice through dataset
    // aliases over the SAME frame — per-side `.select(... as "sh_a")`
    // projections would make the two broadcast subtrees canonically
    // different and each join would build (and UDF-evaluate) its own
    // broadcast; with the shared frame, exchange reuse computes the shingle
    // sets / signatures once (guide §2.4: share one exchange).
    if (verifyExact) {
      val sh = broadcast(
        docs.select(col(idCol).as("vid"), shinglesUdf(col(textCol)).as("sh")))
      cand
        .join(sh.as("va"), col("id_a") === col("va.vid"))
        .join(sh.as("vb"), col("id_b") === col("vb.vid"))
        .withColumn("inter",
          size(array_intersect(col("va.sh"), col("vb.sh"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("va.sh")) + size(col("vb.sh")) - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    } else {
      val sg = broadcast(sigs.select(col("id").as("vid"), col("sig")))
      cand
        .join(sg.as("va"), col("id_a") === col("va.vid"))
        .join(sg.as("vb"), col("id_b") === col("vb.vid"))
        .withColumn("est_jaccard",
          aggregate(zip_with(col("va.sig"), col("vb.sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / k)
        .filter(col("est_jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("est_jaccard"))
    }
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over tokens (deterministic). */
  private[ops] def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = (MurmurHash3.stringHash(t, 0x2545f491).toLong << 32) |
        (MurmurHash3.stringHash(t, 0x9e3779b9) & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs: 64-bit fingerprint, block on nChunks equal bit
    * slices (a pair within Hamming distance ≤ nChunks-1 shares at least one
    * exact chunk — pigeonhole), verify Hamming distance ≤ maxHamming on
    * candidates. nChunks is auto-sized to the smallest power-of-two chunking
    * that keeps the pigeonhole guarantee EXHAUSTIVE for the requested radius
    * (4×16-bit for ham≤3, 8×8-bit for ham≤7, 16×4-bit for ham≤15). Radii > 15
    * would need >16 chunks of <4 bits, whose buckets approach all-pairs —
    * rejected rather than silently losing recall. Wide radii cost more
    * candidates at scale (narrower chunks → hotter buckets); that's inherent
    * to wide-radius Hamming LSH, not an implementation artifact.
    */
  /** Per-document 64-bit SimHash signatures as (id, sim) — the blocking
    * input of [[simhashPairs]], exposed so the driver's exhaustiveness check
    * (`dedup_simhash_check`) can brute-force the same signatures.
    */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val shUdf = udf { (text: String) =>
      val toks = if (text == null) Seq.empty[String]
        else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      simhash64(toks)
    }
    docs.select(col(idCol).as("id"), shUdf(col(textCol)).as("sim"))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"simhashPairs blocking is exhaustive only for maxHamming <= 15, got $maxHamming")
    val nChunks = if (maxHamming <= 3) 4 else if (maxHamming <= 7) 8 else 16
    val chunkBits = 64 / nChunks
    val chunkMask = (1L << chunkBits) - 1
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = simhashSignatures(docs, idCol, textCol)
    val chunkArr = array((0 until nChunks).map(c =>
      shiftright(col("sim"), c * chunkBits).bitwiseAND(lit(chunkMask))): _*)
    val chunked = sigs.select(col("id"), col("sim"),
      posexplode(chunkArr).as(Seq("chunk", "ck")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ---------- embedding cosine near-dup ----------

  /** Embedding near-dup pairs via random-hyperplane LSH blocking + exact
    * cosine verify (id_a < id_b, cosine ≥ threshold). `planes` deterministic
    * from seed.
    */
  def embeddingCosinePairs(embeddings: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 12, nTables: Int = 4, seed: Int = 42,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col(vecCol))).first().getInt(0)
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nPlanes) { (t, p) =>
      Array.tabulate(dim) { d =>
        // deterministic pseudo-gaussian via hash → uniform sum
        val h1 = MurmurHash3.productHash((seed, t, p, d, 1))
        val h2 = MurmurHash3.productHash((seed, t, p, d, 2))
        (h1.toDouble / Int.MaxValue + h2.toDouble / Int.MaxValue) / 2.0
      }
    }
    val bc = spark.sparkContext.broadcast(planes)
    val sketchUdf = udf { (v: Seq[Double]) =>
      val ps = bc.value
      (0 until nTables).map { t =>
        var sig = 0
        var p = 0
        while (p < nPlanes) {
          var dot = 0.0
          var d = 0
          val plane = ps(t)(p)
          val n = math.min(plane.length, v.length)
          while (d < n) { dot += plane(d) * v(d); d += 1 }
          if (dot >= 0) sig |= (1 << p)
          p += 1
        }
        sig
      }
    }
    val cosUdf = udf((a: Seq[Double], b: Seq[Double]) =>
      graft.functions.Embed.cosine(a.toArray, b.toArray))

    val sk = embeddings.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vec"),
        posexplode(sketchUdf(col(vecCol).cast("array<double>"))).as(Seq("table", "sig")))
    sk.as("a").join(sk.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("va"), col("b.vec").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", cosUdf(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  // ---------- cluster-level dedup (pairs → components → canonical) ----------

  /** Collapse a near-dup PAIR relation into duplicate clusters: every doc
    * gets the cluster's minimum member id as `cluster_id`, and `keep` marks
    * the one canonical representative per cluster (singletons keep
    * themselves). Near-duplication is transitive in practice (a~b, b~c ⇒ one
    * cluster {a,b,c}) — pair-at-a-time dropping would keep one doc per PAIR,
    * not per cluster, and over-retain chains.
    *
    * Scale shape: `pairs` comes from any bucketed candidate generator
    * ([[minhashLshPairs]] at corpus scale; [[ngramJaccardPairs]] for exact
    * small-N work), so the edge relation is O(near-dup pairs), not O(n²);
    * the transitive closure reuses [[graft.canon.ConnectedComponents]]
    * (driver union-find under 100k edges, pointer-jumping loop above). Ids
    * are zero-padded for the label ordering because CC min()s its string
    * labels lexicographically.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val pad = (c: org.apache.spark.sql.Column) => format_string("%012d", c)
    val edges = pairs.select(pad(col("id_a")).as("src"), pad(col("id_b")).as("dst"))
    val cc = graft.canon.ConnectedComponents.run(docs.sparkSession, edges)
    docs.select(col(idCol))
      .join(cc.select(col("id").cast("long").as(idCol),
        col("component").cast("long").as("cluster_id")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col(idCol))
  }

  /** `docs` with every non-canonical near-dup cluster member dropped. */
  def dedupFuzzy(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      dedupClusters(docs, pairs, idCol).filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** CCNet-style LINE-level dedup: drop every line that occurs in at least
    * `minDocs` distinct documents (boilerplate headers, navigation chrome,
    * license banners — the sub-document duplication doc-level dedup cannot
    * see), and rebuild each document from its surviving lines in order.
    *
    * Returns (idCol, n_lines, n_dropped, text_out) for EVERY input document
    * — a fully-boilerplate document survives with text_out = "".
    *
    * A line's duplication count is `count(DISTINCT doc)` — repeating a line
    * WITHIN one document does not make it corpus-boilerplate.
    *
    * Scale: one shuffle groups lines by content for the frequency count, one
    * anti-join removes flagged lines, one groupBy(doc) rebuilds. Line text
    * itself is the shuffle key here for oracle-exactness; at PB scale key
    * both sides by xxhash64(line) instead — the join halves its shuffled
    * bytes and a 64-bit collision merely drops one innocent line.
    *
    * @param sep line separator, treated as a LITERAL string (default "\n").
    */
  def dedupLines(docs: DataFrame, minDocs: Int, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val pat = java.util.regex.Pattern.quote(sep)
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), pat, -1)).as(Seq("pos", "line")))
    val dup = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("line"))
    val kept = lines.join(dup, Seq("line"), "left_anti")
    val stats = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), sep).as("text_out"))
    stats.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("text_out"), lit("")).as("text_out"))
  }

  // ---------- substring-level dedup (ExactSubstr class) ----------

  /** Exact duplicated-substring spans (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr class, below
    * the line/document granularity the other operators cover): maximal
    * character ranges whose every length-`window` substring occurs at
    * `minOccurrences`+ positions corpus-wide. Reference behavior analogue:
    * the training pipelines this engine feeds must strip verbatim repeated
    * passages (license blocks, quoted chain letters) that document- and
    * line-level dedup both miss.
    *
    * Formulation: one row per character position (stride-1 length-`window`
    * md5 fingerprint), frequency count by fingerprint, semi-join back, then
    * per-document gaps-and-islands merge (two duplicated windows coalesce
    * when their character ranges overlap or touch, i.e. start gap <=
    * `window`). Returns (idCol, span_start, span_end, span_len), 1-based
    * inclusive character positions.
    *
    * Scale: stride-1 emission is O(corpus chars) rows of (id, pos, 16-byte
    * hash) — the honest cost of exact substring semantics (the suffix-array
    * construction the paper uses reads every byte too). The frequency
    * aggregation map-side-combines on the hash; the islands window partitions
    * by document, never globally. At PB scale run [[winnowFingerprints]]
    * first and feed only fingerprint-sharing documents through this exact
    * pass — the winnowing guarantee (see there) makes that filter lossless
    * for spans of length >= w + k - 1.
    */
  def duplicateSpans(docs: DataFrame, window: Int, minOccurrences: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minOccurrences >= 2, s"minOccurrences must be >= 2, got $minOccurrences")
    val wins = docs
      .filter(length(col(textCol)) >= window)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)) - window + 1)).as("pos"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        md5(col(textCol).substr(col("pos"), lit(window))).as("h"))
    val dup = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minOccurrences)
      .select(col("h"))
    val marked = wins.join(dup, Seq("h"), "left_semi")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > window, 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + window - 1).as("span_end"))
    spans.select(col(idCol), col("span_start"), col("span_end"),
      (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** The removal step of ExactSubstr dedup: rebuild every document with its
    * duplicated spans (from [[duplicateSpans]]) cut out. Policy: ALL
    * occurrences drop — boilerplate-removal semantics, the same rule
    * [[dedupLines]] applies at line granularity (keep-one-occurrence needs a
    * global canonical pick across documents; layer it on the span report if
    * a pipeline wants it).
    *
    * Returns (idCol, n_spans, chars_dropped, text_out) for EVERY input
    * document — span-free documents pass through verbatim, fully-duplicated
    * ones survive with text_out = "".
    *
    * Scale: spans per document are few and disjoint (islands merge), so the
    * rebuild is one collect_list + a fold over the span array per document —
    * no per-character explosion on the engine side (the oracle may be as
    * naive as it likes).
    */
  def dropDuplicateSpans(docs: DataFrame, window: Int, minOccurrences: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = duplicateSpans(docs, window, minOccurrences, idCol, textCol)
    val perDoc = spans.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_spans"),
      sum(col("span_len")).as("chars_dropped"),
      array_sort(collect_list(struct(col("span_start"), col("span_end")))).as("spans"))
    docs.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("chars_dropped"), lit(0L)).as("chars_dropped"),
        when(col("spans").isNull, col(textCol)).otherwise(
          // fold spans left-to-right carrying (rebuilt text, cursor): emit
          // the gap before each span, skip the span, then emit the tail
          aggregate(col("spans"),
            struct(lit("").as("t"), lit(1L).as("cur")),
            (acc, s) => struct(
              concat(acc.getField("t"),
                col(textCol).substr(acc.getField("cur").cast("int"),
                  (s.getField("span_start") - acc.getField("cur")).cast("int"))).as("t"),
              (s.getField("span_end") + 1).as("cur")),
            acc => concat(acc.getField("t"),
              col(textCol).substr(acc.getField("cur").cast("int"),
                (length(col(textCol)) - acc.getField("cur") + 1).cast("int"))))
        ).as("text_out"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 — the
    * MOSS local fingerprinting algorithm): hash every character k-gram, then
    * in each window of `w` consecutive k-gram hashes select the minimum.
    * This is the alignment-invariant SCALE path for substring dedup: anchor
    * positions are content-defined, so the two occurrences of a duplicated
    * passage select the same anchors no matter where they sit in their
    * documents (a stride-s grid cannot do this — the occurrences' grids
    * differ by an arbitrary phase).
    *
    * GUARANTEE (the paper's correctness property): every duplicated
    * substring of length >= w + k - 1 contains w consecutive k-grams, any
    * complete window's minimum is selected, and the selection depends only
    * on content — so both occurrences select a shared in-span fingerprint.
    * Expected density 2/(w+1); candidate generation for [[duplicateSpans]]
    * at PB scale equi-joins these fingerprints instead of every position.
    *
    * Determinism: the window minimum is taken over the string
    * `hash + "#" + zero-padded pos`, so a (vanishingly unlikely) md5 tie
    * breaks to the lowest position — one portable total order shared with
    * the DuckDB oracle. Documents shorter than w + k - 1 (but >= k) select
    * the minimum of their single incomplete window so every hashable
    * document carries at least one fingerprint.
    *
    * Returns distinct (idCol, pos, h): 1-based k-gram start + its md5.
    *
    * Scale: the k-gram scan is O(corpus chars) narrow rows; the per-document
    * window min never shuffles globally; the final distinct is over the
    * ~2n/(w+1) selected anchors only, because selection collapses each
    * window to one candidate BEFORE the shuffle.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(w >= 2, s"w must be >= 2, got $w")
    val kgrams = docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)) - k + 1)).as("pos"))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        length(col(textCol)).cast("long").as("n"),
        md5(col(textCol).substr(col("pos"), lit(k))).as("h"))
      .withColumn("key", concat(col("h"), lit("#"), lpad(col("pos").cast("string"), 10, "0")))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    kgrams
      .withColumn("wmin", min(col("key")).over(byDoc.rowsBetween(0, w - 1)))
      // complete windows only (plus the single incomplete window of a short
      // doc): starts past n_kgrams - w + 1 are suffixes of the last complete
      // window and would re-select its tail minima with no new coverage
      .filter(col("pos") <= greatest(col("n") - (k - 1) - (w - 1), lit(1L)))
      .select(col(idCol),
        substring(col("wmin"), 1, 32).as("h"),
        expr("cast(substring(wmin, 34, 10) as long)").as("pos"))
      .distinct()
      .select(col(idCol), col("pos"), col("h"))
  }
}
