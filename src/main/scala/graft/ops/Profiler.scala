package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling for committed tables — the warehouse health
  * report every lakehouse CLI grows (null counts, approximate distincts,
  * value ranges), surfaced as `TableApp profile <table>`.
  *
  * Shape: ONE aggregation job over the table computes every column's
  * stats simultaneously (4 aggregates per column fused into a single
  * partial-aggregating pass — never one scan per column, which at a
  * 100 TB table with 50 columns would be 50 scans). Distincts use Spark's
  * built-in HyperLogLog++ (`approx_count_distinct`, rsd 5%): hash-based
  * and merge-order-free, so the report is deterministic and
  * partitioning-independent. Min/max are rendered as strings so one
  * narrow output schema covers every column type; complex types profile
  * null/distinct only (no total order to min/max).
  */
object Profiler {

  /** (column, dtype, rows, nulls, null_frac, distinct_approx, min, max) —
    * one row per input column, input column order preserved.
    */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      // backtick-quote the schema name so a dot is treated as part of the
      // column name, not struct-field access (bare col(name) — and df(name),
      // which parses identically — fail analysis on dotted column names;
      // ADVICE r5 finding). Embedded backticks escape by doubling.
      val c = col("`" + f.name.replace("`", "``") + "`")
      val orderable = f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType => false
        case _: org.apache.spark.sql.types.MapType => false
        case _: org.apache.spark.sql.types.StructType => false
        case _: org.apache.spark.sql.types.BinaryType => false
        case _ => true
      }
      Seq(
        count(lit(1)).as(s"__n_${f.name}"),
        count(when(c.isNull, lit(1))).as(s"__nulls_${f.name}"),
        approx_count_distinct(c).as(s"__dist_${f.name}"),
        (if (orderable) min(c).cast("string") else lit(null).cast("string"))
          .as(s"__min_${f.name}"),
        (if (orderable) max(c).cast("string") else lit(null).cast("string"))
          .as(s"__max_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    fields.toSeq.map { f =>
      val n = row.getAs[Long](s"__n_${f.name}")
      val nulls = row.getAs[Long](s"__nulls_${f.name}")
      (f.name, f.dataType.simpleString, n, nulls,
        if (n == 0) 0.0 else math.rint(nulls.toDouble / n * 10000) / 10000,
        row.getAs[Long](s"__dist_${f.name}"),
        Option(row.getAs[String](s"__min_${f.name}")).orNull,
        Option(row.getAs[String](s"__max_${f.name}")).orNull)
    }.toDF("column", "dtype", "rows", "nulls", "null_frac",
      "distinct_approx", "min", "max")
  }
}
