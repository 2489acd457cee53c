package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiling (the ANALYZE / data-quality pass every
  * pipeline runs before trusting a table): null count, exact distinct
  * count, and rendered min/max per profiled column, ONE scan for all
  * columns — partial aggregates absorb everything map-side, so the
  * shuffle is one row per partition regardless of table size.
  *
  * Exact COUNT(DISTINCT) over several columns expands the aggregate
  * (one pass per distinct in Spark's Expand); that is the correctness
  * baseline — at 100 TB swap `approx_count_distinct` in via `distinctFn`
  * (the a7 HLL path) and the plan collapses back to one pass.
  */
object Profile {

  /** A profiled column: `render` turns min/max into engine-stable strings
    * (decimal-stage doubles — NOTES.md float-repr rule).
    */
  final case class ColSpec(name: String, render: Column => Column = _.cast(StringType))

  val decimalRender: Column => Column =
    c => c.cast(DecimalType(20, 4)).cast(StringType)

  def profile(df: DataFrame, specs: Seq[ColSpec],
      distinctFn: Column => Column = count_distinct(_)): DataFrame = {
    val aggs = specs.zipWithIndex.flatMap { case (sp, i) =>
      val c = col(sp.name)
      Seq(
        sum(c.isNull.cast(LongType)).as(s"nn_$i"),
        distinctFn(c).as(s"nd_$i"),
        sp.render(min(c)).as(s"mn_$i"),
        sp.render(max(c)).as(s"mx_$i"))
    }
    val stackArgs = specs.zipWithIndex
      .map { case (sp, i) => s"'${sp.name}', nn_$i, nd_$i, mn_$i, mx_$i" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${specs.length}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_s, max_s)")
  }
}
