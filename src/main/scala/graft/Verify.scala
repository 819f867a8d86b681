package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // opt-in local-iteration filter (comma-separated name prefixes); the
    // driver sets nothing, so its gate always dumps every query
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    // the ~100 query dumps are independent (each writes its own directory)
    // and dominated by per-job fixed overhead, so run them on a small pool
    // of concurrent submitter threads — Spark schedules concurrent actions
    // from one session safely; wall time drops ~3× vs sequential
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = selected.toSeq.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          // repartition(1), NOT coalesce(1): an empty-relation result can
          // reach the writer with ZERO partitions (AQE collapses empty
          // shuffles), and coalesce(1) of zero partitions is still zero →
          // no parquet file at all → the driver reads "output missing"
          // instead of the empty relation. repartition always materializes
          // exactly one (possibly empty, schema-bearing) output file. Row
          // ORDER in the file is irrelevant: the driver compare
          // (tools/selfcheck.py replica) sorts rows before hashing — the
          // queries' orderBy exists to make limit/top-k MEMBERSHIP
          // deterministic, not file order.
          try fn(spark, sfDir).repartition(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
