package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

object CosineAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")).cache()
    v.count()
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      // warmup then 2 measured
      val df = v.as("a").crossJoin(v.as("b"))
        .select(c.as("s")).agg(sum(col("s")))
      df.collect()
      val t0 = System.nanoTime(); df.collect()
      val t1 = System.nanoTime(); df.collect()
      println(f"[ab] $name: ${(System.nanoTime()-t1)/1e9}%.2f / ${(t1-t0)/1e9}%.2f s for 4M cosines")
    }
    time("native-expr")(graft.functions.expr.CosineSimilarity(col("a.emb"), col("b.emb")))
    time("hof")(VectorOps.cosineHof(col("a.emb"), col("b.emb")))
    spark.stop()
  }
}
