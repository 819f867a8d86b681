package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (3L, "completely different content about semiconductor supply chains and foundry capacity"),
    (4L, "el rapido zorro marron salta sobre el perro perezoso junto al rio"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val d = Dedup.exact(docs).collect()
    val dupGroup = d.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) === 0L) // keep_id = min(0,1)
    assert(Dedup.exactDropList(docs).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("ngram jaccard finds near-dup pair (0,2) and not (0,3)") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)) && pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment catches a quoted subset that Jaccard dilutes away") {
    val quoteDocs = Seq(
      (0L, "alpha beta gamma delta"),                      // the short doc
      (1L, "alpha beta gamma delta " +                     // quotes 0 inside
        "unrelated filler words continue onward for a while longer here"),
      (2L, "totally different content nothing shared at all")
    ).toDF("doc_id", "text")
    val c = Dedup.ngramContainmentPairs(quoteDocs, n = 2, threshold = 0.9)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // every bigram of doc 0 appears in doc 1 -> containment exactly 1.0
    assert(c.map(r => (r._1, r._2)).toSet === Set((0L, 1L)))
    assert(c.head._6 === 1.0 && c.head._3 === c.head._4)
    // the same pair is INVISIBLE to Jaccard at any comparable threshold
    val j = Dedup.ngramJaccardPairs(quoteDocs, n = 2, threshold = 0.9)
    assert(j.isEmpty)
  }

  test("int8 quantization: pinned rounding, zero-vector safe, quantized top-k ≈ exact top-k") {
    import graft.ops.Similarity
    val qz = Similarity.quantize(
        Seq((0L, Seq(0.5f, -1.0f, 0.25f)), (1L, Seq(0.0f, 0.0f, 0.0f)))
          .toDF("vec_id", "embedding"))
      .select($"vec_id", $"qvec", $"qscale")
      .as[(Long, Seq[Int], Double)].collect().map(r => r._1 -> r).toMap
    // scale = 127/1.0; floor(0.5*127+0.5)=64, floor(-127+0.5)=-127, floor(31.75+0.5)=32
    assert(qz(0L)._2 === Seq(64, -127, 32) && qz(0L)._3 === 127.0)
    assert(qz(1L)._2 === Seq(0, 0, 0) && qz(1L)._3 === 0.0)
    // the quantized metric is the MAX-NORMALIZED dot (each vector scaled by
    // its own 127/max|x|) — compare against that same metric in full
    // precision: overlap loss is then only the 1/254 quantization step
    val rnd = new scala.util.Random(3L)
    val raw = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0f, 0f, 0f) else Array(0f, 1.0f, 0f, 0f)
      (i, base.map(_ + rnd.nextFloat() * 0.1f).toSeq)
    }
    val vecs = raw.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def maxNorm(v: Seq[Float]): Seq[Double] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      v.map(_.toDouble / m)
    }
    val exact = (0L until 2L).map { q =>
      val qv = maxNorm(raw(q.toInt)._2)
      q -> raw.filter(_._1 != q).map { case (id, v) =>
        id -> maxNorm(v).zip(qv).map { case (a, b) => a * b }.sum
      }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    }.toMap
    val quant = Similarity.quantizedTopK(vecs, queries, k = 10)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq(0L, 1L).foreach { q =>
      val overlap = (exact(q) & quant(q)).size
      assert(overlap >= 8, s"q$q quantized vs full-precision drift: $overlap/10")
      // the semantic contract: every quantized neighbor shares q's cluster
      assert(quant(q).forall(_ % 2 == q % 2), quant(q))
    }
  }

  test("dedupClusters: transitive chain collapses to one cluster; singleton keeps itself") {
    import spark.implicits._
    val d = Seq((10L, ""), (11L, ""), (12L, ""), (20L, "")).toDF("doc_id", "text")
    // chain 10~11, 11~12 (10 and 12 never paired directly) + singleton 20
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val c = Dedup.dedupClusters(d, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(c === Map(10L -> ((10L, true)), 11L -> ((10L, false)),
      12L -> ((10L, false)), 20L -> ((20L, true))))
    assert(Dedup.dedupFuzzy(d, pairs).select("doc_id").as[Long].collect().toSet
      === Set(10L, 20L))
  }

  test("minhash-LSH recalls the exact-dup pair and the near-dup pair") {
    val pairs = Dedup.minhashLshPairs(docs, n = 3, k = 32, bands = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup must be recalled: $pairs")
    assert(pairs.contains((0L, 2L)), s"near dup should be recalled: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash near-dup within hamming distance; distinct docs apart") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical → hamming 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 40).map { i =>
      val base = Array.tabulate(16)(d => math.sin(i / 8 * 31 + d).toFloat)
      val noisy = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
      (i.toLong, noisy.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("embedding cosine pairs: same-cluster vectors found, cross-cluster not") {
    val pairs = Dedup.embeddingCosinePairs(vecs, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    // clusters are blocks of 8 consecutive ids
    assert(pairs.forall { case (a, b) => a / 8 == b / 8 })
  }

  test("brute-force ANN top-k returns same-cluster neighbors, ranked") {
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val res = Similarity.bruteForceTopK(vecs, queries, k = 3).collect()
    assert(res.length === 6)
    assert(res.forall(r => r.getLong(2) / 8 == r.getLong(0) / 8))
    // ranks are 1..3 per query
    assert(res.groupBy(_.getLong(0)).forall(_._2.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3)))
  }

  test("IVF ANN recalls most of brute-force top-k") {
    val queries = vecs.filter($"vec_id" % 8 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val bf = Similarity.bruteForceTopK(vecs, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(vecs, queries, k = 3, nCentroids = 8, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
  }

  test("IVF multiAssign: full probe + full assign equals brute force exactly (dedupe holds)") {
    val queries = vecs.filter($"vec_id" % 8 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val bf = Similarity.bruteForceTopK(vecs, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // every row in every cell, every cell probed: candidates = all pairs, so
    // only correct duplicate-dropping can reproduce brute force rank-exactly
    val full = Similarity.ivfTopK(vecs, queries, k = 3, nCentroids = 4, nprobe = 4,
      multiAssign = 4).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full === bf)
    // and r=2 at half the probes recalls at least as much as r=1
    def recall(r: Int): Double = {
      val ivf = Similarity.ivfTopK(vecs, queries, k = 3, nCentroids = 8, nprobe = 2,
        multiAssign = r).collect().map(x => (x.getLong(0), x.getLong(2))).toSet
      (bf.map(t => (t._1, t._3)) intersect ivf).size.toDouble / bf.size
    }
    assert(recall(2) >= recall(1))
  }

  test("persisted IVF index: committed round-trip serves identically; increments extend it") {
    val queries = vecs.filter($"vec_id" % 8 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val adHoc = Similarity.ivfTopK(vecs, queries, k = 3, nCentroids = 8,
      nprobe = 2, kmeansIters = 2, multiAssign = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // build → commit (assignments partitioned by cell) → read back → serve
    val (cents, assigned) = Similarity.buildIvfIndex(vecs, nCentroids = 8,
      kmeansIters = 2, multiAssign = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val log = new graft.tables.SnapshotLog(spark, dir)
    log.commit("ann_centroids", cents)
    log.commit("ann_assignments", assigned, partitionBy = Seq("cell"))
    val served = Similarity.ivfTopKIndexed(
        log.read("ann_centroids").get, log.read("ann_assignments").get,
        queries, k = 3, nprobe = 2, multiAssign = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served === adHoc)

    // incremental: assigning the corpus in two halves against the SAME
    // committed centroids unions to exactly the full assignment relation
    val half1 = vecs.filter($"vec_id" < 20)
    val half2 = vecs.filter($"vec_id" >= 20)
    val inc = Similarity.assignToIndex(cents, half1, multiAssign = 2)
      .union(Similarity.assignToIndex(cents, half2, multiAssign = 2))
      .select($"cell", $"vec_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val fullAssign = assigned.select($"cell", $"vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(inc === fullAssign)
  }

  test("IVF with trained centroids (Lloyd) matches or beats untrained recall; deterministic") {
    val queries = vecs.filter($"vec_id" % 8 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val bf = Similarity.bruteForceTopK(vecs, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(iters: Int): Double = {
      val ivf = Similarity.ivfTopK(vecs, queries, k = 3, nCentroids = 8, nprobe = 2,
        kmeansIters = iters).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (bf intersect ivf).size.toDouble / bf.size
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 >= r0, s"training must not hurt recall at equal probes ($r0 -> $r2)")
    assert(r2 >= 0.6, s"trained recall too low: $r2")
    // deterministic training: identical centroids across runs
    val c1 = Similarity.kmeansCentroids(vecs, nCentroids = 8, iters = 2)
    val c2 = Similarity.kmeansCentroids(vecs, nCentroids = 8, iters = 2)
    assert(c1 === c2)
  }

  test("text analysis: langid, token counts, quality, fingerprint") {
    val annotated = TextAnalysis.annotate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(annotated(0L).getAs[String]("lang_pred") === "en")
    assert(annotated(4L).getAs[String]("lang_pred") === "es")
    assert(annotated(5L).getAs[String]("lang_pred") === "und")
    assert(annotated(0L).getAs[Int]("n_tokens") === 14)
    assert(annotated(0L).getAs[String]("fingerprint") ===
      annotated(1L).getAs[String]("fingerprint"))
    assert(annotated(0L).getAs[String]("fingerprint") !==
      annotated(2L).getAs[String]("fingerprint"))
    assert(annotated(0L).getAs[Double]("quality") > annotated(5L).getAs[Double]("quality"))
  }

  test("from-spec XXH64 matches Spark's codegen xxhash64 on every tail-length class") {
    // token lengths exercising every branch of the spec: empty, <4, exactly
    // 4, 4<len<8, exactly 8, 8<len<32, exactly 32, >32 (stripe loop), and
    // multi-byte UTF-8; longs exercise the 8-LE-byte path at every fold step
    val toks = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
      "abcdefghi", "abcdefghijklmnop", "abcdefghijklmnopqrstuvwxyz012345",
      "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH", "naïve-ünïcôdé-日本語")
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("i", "t")
    val sparkSide = df.orderBy("i")
      .select(xxhash64(lit(0L), col("t")), xxhash64(lit(-987654321L), col("t")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val refSide = toks.map { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (graft.functions.XxHash64Ref.hash(b, graft.functions.XxHash64Ref.hashLong(0L, 42L)),
        graft.functions.XxHash64Ref.hash(b, graft.functions.XxHash64Ref.hashLong(-987654321L, 42L)))
    }
    assert(sparkSide.toSeq === refSide)
    // and the full rolling fold equals the production column on real-ish text
    val texts = Seq("The quick brown fox; jumps over 42 lazy dogs!",
      "", "one", "päällekkäisyys detection — multi byte tokens herë")
    val tdf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("i", "text")
    val prod = tdf.orderBy("i")
      .select(TextAnalysis.rollingHash(col("text"))).collect().map(_.getLong(0))
    val ref = tdf.orderBy("i")
      .select(TextAnalysis.tokens(col("text"))).collect()
      .map(r => graft.functions.XxHash64Ref.rollingFold(r.getSeq[String](0)))
    assert(prod.toSeq === ref.toSeq)
  }

  test("multimodal: REAL PNG + WAV + MP4-metadata decode; metadata-only prunes payload") {
    val media = Multimodal.syntheticMedia(spark, 30)
    // image rows carry genuine PNG bytes (magic + decodable)
    val png = media.filter(_.media_type == "image").head().content
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    assert(Multimodal.decodeImage(png) === Some((16, 16)))
    assert(Multimodal.decodeImage("not an image".getBytes) === None)
    // audio rows carry genuine RIFF/WAVE bytes the JDK decoder accepts
    val wav = media.filter(_.media_id == 1L).head().content
    assert(wav(0) === 'R'.toByte && wav(8) === 'W'.toByte)
    // id=1 → 160 + 1 % 320 = 161 frames at 16 kHz → 10 ms (floor)
    assert(Multimodal.decodeAudio(wav) === Some((16000, 10)))
    assert(Multimodal.decodeAudio("not audio at all".getBytes) === None)
    // video rows carry a spec-compliant minimal MP4 the box walker parses
    val mp4 = media.filter(_.media_id == 2L).head().content
    assert(new String(mp4, 4, 4) === "ftyp")
    // id=2 → dims 24×24, duration 500 + 2 % 1000 = 502 ms
    assert(Multimodal.decodeVideo(mp4) === Some((24, 24, 502)))
    assert(Multimodal.decodeVideo("definitely not an mp4".getBytes) === None)
    // version-1 boxes (64-bit times/duration — the long-file layout real
    // encoders emit): rebuild id=2's moov with v1 mvhd/tkhd, same values
    assert(Multimodal.decodeVideo(OpsSpecMp4.v1Variant(24, 24, 502)) ===
      Some((24, 24, 502)))
    // multi-track file with the AUDIO trak first (0×0 dims, the common real
    // layout): the parser must skip it and report the video trak's dims
    assert(Multimodal.decodeVideo(OpsSpecMp4.twoTrackVariant(320, 180, 750)) ===
      Some((320, 180, 750)))

    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 30)
    // image: dims come from the REAL decoder, not metadata (id=3 → 28×28)
    val img = feats.find(_.media_id == 3L).get
    assert(img.media_type === "image")
    assert(img.width === 28 && img.height === 28)
    assert(img.frames_sampled === img.n_bytes / 64)
    assert(img.sample_rate_hz === 0 && img.duration_ms === 0)
    // audio: REAL javax.sound decode — true rate + duration, whole payload hashed
    val f0 = feats.find(_.media_id == 1L).get
    assert(f0.media_type === "audio")
    assert(f0.width === 0 && f0.height === 0)
    assert(f0.sample_rate_hz === 16000 && f0.duration_ms === 10)
    assert(math.abs(f0.byte_hist.sum - 1.0) < 1e-9)
    assert(f0.frames_sampled === f0.n_bytes / 64)
    // video: REAL ISO-BMFF metadata parse — tkhd dims + mvhd duration
    val vid = feats.find(_.media_id == 2L).get
    assert(vid.media_type === "video")
    assert(vid.width === 24 && vid.height === 24)
    assert(vid.duration_ms === 502 && vid.sample_rate_hz === 0)
    assert(vid.frames_sampled === vid.n_bytes / 64)
    // metadata-only access over a parquet scan must prune the binary column
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val meta = Multimodal.metadataOnly(spark.read.parquet(dir))
    val scan = meta.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
    assert(!readSchema.contains("content"),
      s"payload column must be pruned from the scan: $readSchema")
    assert(meta.count() > 0)
  }

  test("dedupLines drops cross-doc boilerplate, keeps within-doc repeats, rebuilds in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nb\nc"),   // a (3 docs) + b (2 docs) dropped -> "c"
      (2L, "a\nx"),
      (3L, "b\ny\na"),
      (4L, "z\nz\nq"),   // z repeats within ONE doc only -> kept twice
      (5L, "a\nb")        // all lines boilerplate -> empty text survives
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.dedupLines(docs, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, 3L, 2L, "c"),
      (2L, 2L, 1L, "x"),
      (3L, 3L, 2L, "y"),
      (4L, 3L, 0L, "z\nz\nq"),
      (5L, 2L, 2L, "")))
    // separator is literal, not regex: '.' must not mean "any char"
    val dot = Seq((1L, "p.q"), (2L, "p.r")).toDF("doc_id", "text")
    val byDot = graft.ops.Dedup.dedupLines(dot, minDocs = 2, sep = ".")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(byDot === Seq((1L, 2L, 1L, "q"), (2L, 2L, 1L, "r")))
  }

  test("duplicateSpans merges overlapping duplicated windows into one maximal span") {
    import spark.implicits._
    // "SHAREDPASSAGEBLOCK" (18 chars) planted in two docs at different
    // offsets; surroundings unique. window=6 -> all 13 windows inside the
    // passage are duplicated and must merge into exactly one span per doc.
    val d = Seq(
      (1L, "qwzuiSHAREDPASSAGEBLOCKmnbvc"),
      (2L, "03k7fgtplSHAREDPASSAGEBLOCKxe19"),
      (3L, "entirely unrelated filler material")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, window = 6)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Seq((1L, 6L, 23L, 18L), (2L, 10L, 27L, 18L)))
  }

  test("duplicateSpans: within-doc repeat counts; unique corpus yields nothing") {
    import spark.implicits._
    val rep = Seq((1L, "ABCDEFGH....ABCDEFGH")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(rep, window = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(spans === Seq((1L, 1L, 8L, 8L), (1L, 13L, 20L, 8L)))
    val uniq = Seq((1L, "abcdefghij"), (2L, "0123456789")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(uniq, window = 5).count() === 0L)
  }

  test("dropDuplicateSpans rebuilds docs with spans cut; pass-through and full-cover edges") {
    import spark.implicits._
    val d = Seq(
      (1L, "qwzuiSHAREDPASSAGEBLOCKmnbvc"),     // span 6..23 cut -> "qwzui" + "mnbvc"
      (2L, "03k7fgtplSHAREDPASSAGEBLOCKxe19"),  // span 10..27 cut
      (3L, "entirely unrelated filler material"), // no spans -> verbatim
      (4L, "IDENTICALWHOLEDOCUMENT"),
      (5L, "IDENTICALWHOLEDOCUMENT")             // 4,5 fully duplicated -> ""
    ).toDF("doc_id", "text")
    val out = Dedup.dropDuplicateSpans(d, window = 6)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, 1L, 18L, "qwzuimnbvc"),
      (2L, 1L, 18L, "03k7fgtplxe19"),
      (3L, 0L, 0L, "entirely unrelated filler material"),
      (4L, 1L, 22L, ""),
      (5L, 1L, 22L, "")))
    // two spans in one doc: gap between them survives
    val two = Seq(
      (1L, "AAAAAAAAAA-keep-BBBBBBBBBB"),
      (2L, "xyAAAAAAAAAAzw"), (3L, "qrBBBBBBBBBBst")).toDF("doc_id", "text")
    val r = Dedup.dropDuplicateSpans(two, window = 10)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).head
    assert(r === ((1L, 2L, 20L, "-keep-")))
  }

  test("winnowFingerprints: every fingerprint is a real k-gram at its position") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "jumps over the lazy dog near the riverbank under a red sky")
    ).toDF("doc_id", "text")
    val bad = Dedup.winnowFingerprints(d, k = 5, w = 4)
      .join(d, "doc_id")
      .filter(md5(col("text").substr(col("pos").cast("int"), lit(5))) =!= col("h"))
    assert(bad.count() === 0L)
  }

  test("winnowFingerprints guarantee: a duplicate of length w+k-1 shares a fingerprint") {
    import spark.implicits._
    val k = 5; val w = 8
    // planted passage of exactly w+k-1 = 12 chars at different offsets
    val pass = "XQPZLMVKWYTR"
    val d = Seq(
      (1L, s"aaabbbccc${pass}dddeeefff"),
      (2L, s"z9${pass}y8x7w6v5u4t3s2r1q0")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d, k = k, w = w)
      .join(d, "doc_id")
      // keep only fingerprints whose k-gram lies fully inside the passage
      .withColumn("off", expr("locate('" + pass + "', text)"))
      .filter(col("pos") >= col("off") &&
        col("pos") <= col("off") + pass.length - k)
      .select(col("doc_id"), col("h"))
    val shared = fps.filter(col("doc_id") === 1L).select("h")
      .intersect(fps.filter(col("doc_id") === 2L).select("h"))
    assert(shared.count() >= 1L)
  }

  test("winnowFingerprints: layout-invariant, ~2/(w+1) density, short docs covered") {
    import spark.implicits._
    val base = (0L until 40L).map(i =>
      (i, s"doc$i " + ((i * 31 + 7) to (i * 31 + 200)).map(j => (j % 89 + 33).toChar).mkString))
    val d = base.toDF("doc_id", "text")
    val a = Dedup.winnowFingerprints(d, k = 6, w = 9)
      .as[(Long, Long, String)].collect().toSet
    val b = Dedup.winnowFingerprints(d.repartition(7), k = 6, w = 9)
      .as[(Long, Long, String)].collect().toSet
    assert(a === b)
    val nKgrams = base.map(_._2.length - 6 + 1).sum
    assert(a.size > nKgrams / 10 && a.size < nKgrams / 2) // 2/(w+1) = 0.2 +- slack
    // a doc shorter than w+k-1 still selects exactly its single-window min
    val short = Seq((9L, "tinydoc")).toDF("doc_id", "text") // 7 chars, k=6 -> 2 kgrams < w
    assert(Dedup.winnowFingerprints(short, k = 6, w = 9).count() === 1L)
  }

  test("Profiler.profile: one row per column — nulls, distincts, ranges; complex types null/distinct only") {
    import graft.ops.Profiler
    val df = Seq(
      (1L, Some("a"), Seq("x")),
      (2L, Some("b"), Seq("y")),
      (3L, None: Option[String], Seq("x")),
      (4L, Some("a"), Seq.empty[String])
    ).toDF("id", "s", "arr")
    val p = Profiler.profile(df)
      .as[(String, String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(p.keySet === Set("id", "s", "arr") && p("id")._2 === "bigint")
    assert(p("id")._3 === 4L && p("id")._4 === 0L && p("id")._5 === 0.0)
    assert(p("id")._7 === Some("1") && p("id")._8 === Some("4"))
    assert(p("s")._4 === 1L && p("s")._5 === 0.25)
    assert(p("s")._7 === Some("a") && p("s")._8 === Some("b"))
    // HLL++ is exact at tiny cardinalities
    assert(p("id")._6 === 4L && p("s")._6 === 2L && p("arr")._6 === 3L)
    // no total order on arrays: min/max absent, not a crash
    assert(p("arr")._7.isEmpty && p("arr")._8.isEmpty)
    // empty input: rows 0, null_frac 0, no division blowup
    val e = Profiler.profile(df.limit(0))
      .as[(String, String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(e("id")._3 === 0L && e("id")._5 === 0.0)
    // dotted column names resolve exactly (df(name), not col(name) which
    // would parse the dot as struct-field access — ADVICE r5)
    val dotted = Seq((1L, "x"), (2L, "y")).toDF("a.b", "plain")
    val pd = Profiler.profile(dotted)
      .as[(String, String, Long, Long, Double, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(pd.keySet === Set("a.b", "plain") && pd("a.b")._3 === 2L)
  }
}

/** Builds a minimal MP4 with VERSION-1 mvhd/tkhd boxes (64-bit times and
  * durations — the layout real encoders emit for long files) to exercise
  * `Multimodal.decodeVideo`'s v1 offsets, which the synthetic corpus (v0)
  * does not cover.
  */
object OpsSpecMp4 {
  def v1Variant(w: Int, h: Int, durMs: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + 240 + 8)
    def fourcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
    bb.putInt(24); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
    fourcc("isom"); fourcc("mp41")
    bb.putInt(240); fourcc("moov")
    // mvhd v1 (120): 8 hdr + 4 verflags + 8+8 times + 4 timescale + 8 dur
    // + 4 rate + 2 vol + 10 rsvd + 36 matrix + 24 predefined + 4 next
    bb.putInt(120); fourcc("mvhd"); bb.putInt(0x01000000)
    bb.putLong(0L); bb.putLong(0L)
    bb.putInt(1000); bb.putLong(durMs)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort)
    bb.putShort(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    // trak (112) = 8 hdr + tkhd v1 (104): 8 hdr + 4 verflags + 8+8 times
    // + 4 id + 4 rsvd + 8 dur + 8 rsvd + 8 layer/alt/vol/rsvd + 36 matrix
    // + 8 dims
    bb.putInt(112); fourcc("trak")
    bb.putInt(104); fourcc("tkhd"); bb.putInt(0x01000007)
    bb.putLong(0L); bb.putLong(0L)
    bb.putInt(1); bb.putInt(0); bb.putLong(durMs)
    bb.putLong(0L)
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
    bb.putInt(w << 16); bb.putInt(h << 16)
    bb.putInt(8); fourcc("mdat")
    bb.array()
  }

  /** Minimal MP4 with TWO v0 tracks — an audio trak (0×0 dims) FIRST, then
    * the video trak — the ordering real encoders commonly emit; exercises
    * the parser's skip-dimensionless-tracks behavior.
    */
  def twoTrackVariant(w: Int, h: Int, durMs: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + 316 + 8)
    def fourcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
    def trakV0(trackId: Int, tw: Int, th: Int): Unit = {
      bb.putInt(100); fourcc("trak")
      bb.putInt(92); fourcc("tkhd"); bb.putInt(0x000007)
      bb.putInt(0); bb.putInt(0)
      bb.putInt(trackId); bb.putInt(0); bb.putInt(durMs)
      bb.putLong(0L)
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
      bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
      bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
      bb.putInt(tw << 16); bb.putInt(th << 16)
    }
    bb.putInt(24); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
    fourcc("isom"); fourcc("mp41")
    bb.putInt(316); fourcc("moov")
    bb.putInt(108); fourcc("mvhd"); bb.putInt(0)
    bb.putInt(0); bb.putInt(0)
    bb.putInt(1000); bb.putInt(durMs)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort)
    bb.putShort(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0)
    bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
    bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(3)
    trakV0(1, 0, 0)   // audio first: no presentation dims
    trakV0(2, w, h)   // the video track
    bb.putInt(8); fourcc("mdat")
    bb.array()
  }
}
