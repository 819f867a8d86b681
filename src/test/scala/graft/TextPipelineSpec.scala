package graft

import org.apache.spark.sql.functions._

import graft.ops.{Decontam, Packing, Pii, TextAnalysis, TrainingMix}

/** Decontamination, repetition signals, PII redaction, sequence packing. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams: sliding word windows; short docs yield empty") {
    val df = Seq((0L, "a b c d"), (1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val g = df.select(col("doc_id"), TextAnalysis.ngrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(0L) === Seq("a b c", "b c d"))
    assert(g(1L) === Seq.empty)
    assert(g(2L) === Seq.empty)
  }

  test("repetitionSignals: dup-gram and top-bigram fractions, short-doc zeros") {
    val df = Seq(
      (0L, "a b a b a b"),          // bigrams: ab,ba,ab,ba,ab → top 3/5
      (1L, "x x x x x x x x"),      // 4 identical 5-grams → dup 3/4; bigram 7/7
      (2L, "hi"),                   // too short for any gram
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r(0L) === ((0.0, 0.6)))
    assert(r(1L) === ((0.75, 1.0)))
    assert(r(2L) === ((0.0, 0.0)))
    assert(r(3L) === ((0.0, 0.2)))  // 5 distinct bigrams, top 1/5
  }

  private lazy val trainDocs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),    // shares 5-grams with eval 100
    (1L, "one two three four five six seven"),       // clean
    (2L, "alpha beta gamma delta epsilon other")).toDF("doc_id", "text")
  private lazy val evalDocs = Seq(
    (100L, "prefix alpha beta gamma delta epsilon zeta suffix")).toDF("doc_id", "text")

  test("contaminationReport counts distinct shared n-grams; decontaminate drops them") {
    val rep = Decontam.contaminationReport(trainDocs, evalDocs, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0: grams "alpha beta gamma delta epsilon" and "beta gamma delta epsilon zeta"
    assert(rep === Map(0L -> 2L, 2L -> 1L))
    val kept = Decontam.decontaminate(trainDocs, evalDocs, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("pii: counts and redaction") {
    val df = Seq(
      (0L, "mail a.user+tag@sub.example.org or ring 12-345-678-9012 now"),
      (1L, "no pii here, just 123-45 and a-b@c")).toDF("id", "text")
    val r = df.select(col("id"), Pii.countEmails(col("text")).as("e"),
        Pii.countPhones(col("text")).as("p"), Pii.redact(col("text")).as("t"))
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getString(3)))).toMap
    assert(r(0L) === ((1, 1, "mail [EMAIL] or ring [PHONE] now")))
    assert(r(1L) === ((0, 0, "no pii here, just 123-45 and a-b@c")))
  }

  test("packSequences: global offsets = sequential cumsum, bucket-count invariant") {
    val docs = (0L until 100L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens")
    val expected = {
      var off = 0L
      (0L until 100L).map { i =>
        val len = (i % 7) + 1
        val row = (i, len, off, off / 10, (off + len - 1) / 10)
        off += len
        row
      }
    }
    for (nb <- Seq(1, 7)) {
      val got = Packing.packSequences(docs, windowTokens = 10, numBuckets = nb)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got.toSeq === expected, s"numBuckets=$nb")
    }
  }

  test("packSequences plan has no single-partition exchange (distributed scan)") {
    val docs = (0L until 50L).map(i => (i, 3L)).toDF("doc_id", "n_tokens")
    val plan = Packing.packSequences(docs, windowTokens = 16, numBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("packSequences on empty input returns empty WITH the output schema") {
    val docs = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(docs, windowTokens = 8)
    assert(out.isEmpty)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_tokens", "token_offset", "first_bin", "last_bin"))
  }

  test("decontam plan: eval grams broadcast, no shuffle of the training side") {
    val plan = Decontam.contaminationReport(trainDocs, evalDocs, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // gram-keyed shuffles: exactly one, the tiny eval side's distinct before
    // its broadcast — the exploded TRAINING grams reach the join unshuffled
    // (their only later exchange is the post-join doc-id-keyed aggregation
    // over the contaminated subset)
    assert("hashpartitioning\\(gram".r.findAllIn(plan).size === 1, plan)
  }

  test("TrainingMix.prepare: gates, dedup, decontam, mixture, split compose") {
    val docs = Seq(
      // two long clean English docs with identical text -> dedup keeps min id
      (1L, "srcA", ("the cat sat on the mat and looked at the dog " * 3).trim),
      (2L, "srcA", ("the cat sat on the mat and looked at the dog " * 3).trim),
      // contaminated: shares a 5-gram with the eval doc
      (3L, "srcA", ("alpha beta gamma delta epsilon " +
        "the quick brown fox jumps over the lazy dog again and again for length " * 2).trim),
      // too short -> token gate drops it
      (4L, "srcA", "tiny doc")).toDF("doc_id", "source", "text")
    val evalDocs = Seq(
      (100L, "prefix alpha beta gamma delta epsilon suffix")).toDF("doc_id", "text")
    val out = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out.keySet === Set(1L), out.toString)
    assert(Set("train", "valid", "test").contains(out(1L)))

    // the surviving doc is a 3× repeat of one sentence — a dup-5-gram
    // ceiling kicks it out; a permissive ceiling keeps the result unchanged
    val gatedOut = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5, maxDupNgramFrac = Some(0.2))
      .collect()
    assert(gatedOut.isEmpty, gatedOut.mkString(","))
    val permissive = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5, maxDupNgramFrac = Some(0.99),
        maxTopBigramFrac = Some(0.99))
      .collect().map(_.getLong(0)).toSet
    assert(permissive === Set(1L))

    // temperature mixture: the single surviving source keeps rate 1 (max-
    // normalized), so alpha changes nothing here; configuring both mixture
    // styles at once is rejected
    val temp = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5, temperatureAlpha = Some(0.5))
      .collect().map(_.getLong(0)).toSet
    assert(temp === Set(1L))
    intercept[IllegalArgumentException] {
      TrainingMix.prepare(docs, evalDocs, mixtureRates = Map("srcA" -> 0.5),
        temperatureAlpha = Some(0.5)).collect()
    }
  }

  test("TrainingMix fuzzy stage drops a NEAR-duplicate that exact dedup keeps") {
    val base = "the committee approved the annual budget for the harbor expansion " +
      "project after a long debate about funding priorities and timelines overall"
    val docs = Seq(
      (1L, "srcA", base),
      (2L, "srcA", base + " entirely"),  // near-dup of 1, not byte-identical
      (3L, "srcA", "shipping containers move freight across the busy harbor " +
        "every single day with tugboats and cranes working through the afternoon"))
      .toDF("doc_id", "source", "text")
    val evalDocs = Seq((100L, "nothing in common here at all")).toDF("doc_id", "text")
    val exact = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5)
      .collect().map(_.getLong(0)).toSet
    assert(exact === Set(1L, 2L, 3L)) // exact dedup keeps the near-dup
    val fuzzy = TrainingMix.prepare(docs, evalDocs, minTokens = 10,
        minQuality = 0.3, decontamN = 5, fuzzyThreshold = Some(0.7))
      .collect().map(_.getLong(0)).toSet
    assert(fuzzy === Set(1L, 3L)) // cluster {1,2} keeps min id
  }

  test("dsirScores rank target-like docs above off-domain ones; no-gram docs score 0") {
    import graft.ops.DataSelection
    // target grams need real frequency: with add-one smoothing, a gram seen
    // once scores ~ln(2/(Tt+B)) - ln(2/(Tr+B)) ~ 0 and the sign is noise
    val target = Seq(
      (100L, Seq.fill(5)("market earnings revenue quarter").mkString(" ")),
      (101L, Seq.fill(5)("earnings revenue quarter guidance").mkString(" "))
    ).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "market earnings revenue quarter guidance outlook"), // on-domain
      (1L, "zebra habitat savanna migration herd grassland"),   // off-domain
      (2L, "x")                                                  // no bigrams
    ).toDF("doc_id", "text")
    val s = DataSelection.dsirScores(raw, target, n = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(s(0L)._3 > s(1L)._3, s"on-domain must outrank off-domain: $s")
    assert(s(2L) === ((2L, 0L, 0.0)))
    // deterministic under repartition
    val s2 = DataSelection.dsirScores(raw.repartition(5), target.repartition(3), n = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(s2(0L)._3 - s(0L)._3) < 1e-9 &&
      math.abs(s2(1L)._3 - s(1L)._3) < 1e-9)
    // selection keeps the top-k by (score desc, id)
    val kept = DataSelection.dsirSelect(raw, target, keep = 1, n = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(0L))
  }

  test("bigram-LM perplexity: hand-checked probabilities, unseen backoff, empty docs null") {
    import graft.ops.LanguageModel
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val (big, uni, v, t) = LanguageModel.trainBigram(ref)
    assert(v === 2L && t === 4L)
    val docs = Seq((0L, "a b"), (1L, "b a"), (2L, "z z"), (3L, "")).toDF("doc_id", "text")
    val out = LanguageModel.perplexity(docs, big, uni, v, t)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    // "a b": first a -> (2+1)/(4+2); (a,b) -> (2+1)/(2+2)
    val lpAB = (math.log(0.5) + math.log(0.75)) / 2
    // "b a": first b -> 0.5; (b,a) -> (1+1)/(2+2)
    val lpBA = (math.log(0.5) + math.log(0.5)) / 2
    // "z z": unseen first -> 1/6; unseen pair, empty context -> 1/(0+2)
    val lpZZ = (math.log(1.0 / 6) + math.log(0.5)) / 2
    assert(out(0L)._1 === 2L && math.abs(out(0L)._2.get - lpAB) < 1e-12)
    assert(math.abs(out(1L)._2.get - lpBA) < 1e-12)
    assert(math.abs(out(2L)._2.get - lpZZ) < 1e-12)
    assert(out(3L) === ((0L, None))) // no tokens: no evidence, not "perfect"
    // fluent-under-the-model text must get LOWER perplexity than gibberish
    assert(out(0L)._2.get > out(2L)._2.get)
  }

  test("BPE merges: overlapping pair counts, greedy rewrite, deterministic ties") {
    import graft.ops.Bpe
    // word counts: aaab x3, ab x2
    val corpus = Seq((0L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(corpus, rounds = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    // r1: (a,a) 6 (aaab has TWO overlapping (a,a) per occurrence);
    // r2: (a,b) 5 (greedy rewrite left "<aa> <a> <b>", not "<a> <aa> <b>");
    // r3: (aa,ab) 3
    assert(merges === Seq((1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
    val v = Bpe.vocab(corpus, rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(v === Map("aaab" -> 3L, "ab" -> 2L))
    // tie at count 2 breaks to the lexicographically smaller pair
    val tie = Seq((0L, "xy xy zw zw")).toDF("doc_id", "text")
    val m1 = Bpe.trainMerges(tie, rounds = 1)
      .as[(Int, String, String, Long)].collect().head
    assert(m1 === ((1, "x", "y", 2L)))
    // more rounds than mergeable pairs: extra rounds yield no rows
    val exhausted = Bpe.trainMerges(Seq((0L, "ab ab")).toDF("doc_id", "text"), rounds = 4)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(exhausted === Seq((1, "a", "b", 2L)))
  }

  test("BPE encode: trained merges segment docs; merges never jump word boundaries") {
    import graft.ops.Bpe
    val model = Seq(("a", "a"), ("a", "b"), ("aa", "ab")) // from the aaab corpus
    val docs = Seq(
      (0L, "aaab ab"),  // <aaab> + <ab> = 2 tokens
      (1L, "a b"),      // (a,b) is a merge but 'a','b' are separate WORDS = 2
      (2L, "xyz"),      // unseen chars stay singletons = 3
      (3L, "")          // empty = 0
    ).toDF("doc_id", "text")
    val got = Bpe.encodeTokenCounts(docs, model)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 2L, 2L -> 3L, 3L -> 0L))
  }

  test("quality classifier: separates the classes it trained on, prior-only fallback") {
    import graft.ops.QualityClassifier
    val pos = Seq(
      (100L, Seq.fill(4)("clear prose with real sentences and structure").mkString(" ")),
      (101L, Seq.fill(4)("real sentences carry structure and clear meaning").mkString(" "))
    ).toDF("doc_id", "text")
    val neg = Seq(
      (200L, Seq.fill(4)("buy cheap pills casino bonus click here now").mkString(" ")),
      (201L, Seq.fill(4)("casino bonus cheap pills win win click").mkString(" "))
    ).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "clear prose with real structure"),   // pos-like
      (1L, "cheap pills casino bonus"),          // neg-like
      (2L, "")                                   // no features -> prior only
    ).toDF("doc_id", "text")
    val s = QualityClassifier.scores(docs, pos, neg)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(s(0L)._3 > 0 && s(0L)._4 === 1, s"pos-like must classify 1: $s")
    assert(s(1L)._3 < 0 && s(1L)._4 === 0, s"neg-like must classify 0: $s")
    // equal class priors (2 docs each) -> featureless doc scores ln(1) = 0
    assert(s(2L)._2 === 0L && math.abs(s(2L)._3) < 1e-12 && s(2L)._4 === 0)
    // deterministic under repartition (the hashed-feature property)
    val s2 = QualityClassifier.scores(
        docs.repartition(5), pos.repartition(3), neg.repartition(2))
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(math.abs(s2(id)._3 - s(id)._3) < 1e-9)
    }
    // the model table is mergeable counts, never wider than the bucket domain
    val m = QualityClassifier.trainCounts(pos, neg, buckets = 64)
    assert(m.count() <= 64)
    assert(m.columns.toSeq === Seq("bucket", "cpos", "cneg"))
    // MERGEABILITY (the TableApp classifier O(delta) refresh contract):
    // train on two halves, add counts per bucket == train on the union
    val posB = Seq((102L, "structured clear writing has meaning")).toDF("doc_id", "text")
    val folded = QualityClassifier.trainCounts(pos, neg, 64)
      .union(QualityClassifier.trainCounts(posB, neg.limit(0), 64))
      .groupBy("bucket")
      .agg(sum($"cpos").as("cpos"), sum($"cneg").as("cneg"))
    val whole = QualityClassifier.trainCounts(pos.union(posB), neg, 64)
    assert(folded.except(whole).isEmpty && whole.except(folded).isEmpty)
    // and scoring through the committed-model path == the train-and-score
    // path (same model, same prior)
    val viaModel = QualityClassifier.scoreWithModel(docs, whole, nPos = 3,
        nNeg = 2, buckets = 64)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    val direct = QualityClassifier.scores(docs, pos.union(posB), neg, buckets = 64)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(viaModel === direct)
  }
}
