package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed committed-table experiment (BACKLOG / VERDICT r3 #9): does
  * `bucketBy(subject_uuid)` on the triples snapshot pay for itself on the
  * read side in this environment? Measures, on a synthesized triples-shaped
  * table at two layouts (plain parquet path vs bucketed managed table):
  *
  *  - write cost (the bucketed write shuffles into buckets up front);
  *  - subject-keyed self-join (the 1-hop-expansion shape: t1.object_uuid =
  *    t2.subject_uuid) with broadcast disabled, so the exchange the bucket
  *    layout is supposed to save is actually on the plan;
  *  - groupBy(subject_uuid) aggregation.
  *
  * Prints per-query seconds and whether the executed plan still contains an
  * Exchange on the bucketed side. Numbers land in BASELINE.md; the layout is
  * adopted only if the read-side saving is real.
  */
object BucketProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bucket-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.warehouse.dir", wh)
      // force sort-merge joins: the experiment is about the exchange, and a
      // broadcast join would hide it
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nSubjects = math.max(n / 20, 1L)
    val df = spark.range(n).select(
      concat(lit("s"), (col("id") % nSubjects).cast("string")).as("subject_uuid"),
      concat(lit("s"), ((col("id") * 7 + 3) % nSubjects).cast("string")).as("object_uuid"),
      md5(col("id").cast("string")).as("fact"))

    val plainDir = java.nio.file.Files.createTempDirectory("graft-bucket-plain").toString
    val tPlainWrite = time(df.write.mode("overwrite").parquet(plainDir))
    val tBucketWrite = time(
      df.write.mode("overwrite")
        .bucketBy(buckets, "subject_uuid").sortBy("subject_uuid")
        .format("parquet").saveAsTable("triples_bucketed"))

    def bench(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().write.mode("overwrite").format("noop").save() // warm
      val secs = (1 to 2).map(_ => time(
        mk().write.mode("overwrite").format("noop").save())).min
      val plan = mk().queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(f"[bucket] $label%-28s $secs%7.2fs exchanges=$exchanges%d")
    }

    def plain() = spark.read.parquet(plainDir)
    def bucketed() = spark.table("triples_bucketed")

    println(f"[bucket] write plain=$tPlainWrite%.2fs bucketed=$tBucketWrite%.2fs " +
      f"(n=$n%d, buckets=$buckets%d)")
    bench("selfjoin plain", () =>
      plain().as("a").join(plain().as("b"),
        col("a.object_uuid") === col("b.subject_uuid"))
        .select(col("a.subject_uuid"), col("b.object_uuid")))
    bench("selfjoin bucketed", () =>
      bucketed().as("a").join(bucketed().as("b"),
        col("a.object_uuid") === col("b.subject_uuid"))
        .select(col("a.subject_uuid"), col("b.object_uuid")))
    bench("groupBy plain", () =>
      plain().groupBy("subject_uuid").agg(count(lit(1)).as("n")))
    bench("groupBy bucketed", () =>
      bucketed().groupBy("subject_uuid").agg(count(lit(1)).as("n")))
    // the shape scoped retrieval actually uses: a small key set joined
    // against the big table on the bucket key (shuffle-keyed, not broadcast)
    val keys = spark.range(0, 1000).select(
      concat(lit("s"), col("id")).as("subject_uuid"))
    bench("keyjoin plain", () =>
      plain().join(keys, Seq("subject_uuid")))
    bench("keyjoin bucketed", () =>
      bucketed().join(keys, Seq("subject_uuid")))
    spark.stop()
  }
}
