package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measurement harness backing BASELINE.md's IVF quality claim (VERDICT r2
  * next-round #7): recall@k of `ivfTopK` against `bruteForceTopK` on the
  * driver's embeddings table, for the hash-seeded and the k-means-trained
  * centroid variants across nprobe settings. DedupQualityProbe's P/R plays
  * the same role for MinHash-LSH.
  *
  * Usage: IvfRecallProbe [sfDir] [nQueries] [k]
  */
object IvfRecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nQueries = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-ivf-recall")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid").cast("long"), col("neighbor_id").cast("long"))
        .collect().groupBy(_.getLong(0)).map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }

    val exact = topSet(Similarity.bruteForceTopK(v, q, k))
    for (iters <- Seq(0, 5); nprobe <- Seq(2, 4, 8)) {
      val approx = topSet(Similarity.ivfTopK(v, q, k, nCentroids = 16,
        nprobe = nprobe, kmeansIters = iters))
      val recalls = exact.map { case (g, truth) =>
        approx.getOrElse(g, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      val mean = recalls.sum / recalls.size
      println(f"[ivf-recall] kmeansIters=$iters nprobe=$nprobe nCentroids=16 " +
        f"queries=${exact.size} recall@$k=$mean%.4f")
    }
    spark.stop()
  }
}
