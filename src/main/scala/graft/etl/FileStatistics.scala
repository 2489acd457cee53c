package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file column statistics carried in the manifest, Iceberg-style
  * (min/max/null-count per column + row count per data file). At 100 TB the
  * planner's first job is to NOT read files: a range predicate consults the
  * manifest and opens only the files whose [min, max] overlaps — with a
  * Hilbert-clustered layout (operators/Layout) that is a handful of files
  * out of tens of thousands. Row counts make `COUNT(*)` metadata-only.
  *
  * Numeric mins/maxes are stored as doubles widened by one ulp in each
  * direction, so a long that doesn't round-trip through double (> 2^53)
  * still falls inside its file's recorded range — pruning stays a strict
  * superset of the matching files (never drops a match, may keep a
  * non-match; the caller's filter removes those).
  */
object FileStatistics {

  /** Stats for one column in one file. `None` min/max = all values null. */
  final case class ColStat(
      nulls: Long,
      minN: Option[Double], maxN: Option[Double],
      minS: Option[String], maxS: Option[String]) {

    /** Could any row of this file satisfy `col BETWEEN lo AND hi`?
      * (SQL range semantics: null never matches, so an all-null file is
      * safely prunable.)
      */
    def overlapsNum(lo: Double, hi: Double): Boolean =
      (minN, maxN) match {
        case (Some(mn), Some(mx)) => lo <= mx && hi >= mn
        case _                    => false
      }

    /** String flavor; Java lexicographic compare matches Spark/DuckDB
      * ordering on the ASCII key domains the engine prunes on.
      */
    def overlapsStr(lo: String, hi: String): Boolean =
      (minS, maxS) match {
        case (Some(mn), Some(mx)) => lo <= mx && hi >= mn
        case _                    => false
      }
  }

  final case class FileStats(rows: Long, cols: Map[String, ColStat])

  private val mapper = new ObjectMapper

  def toJson(fs: FileStats): String = {
    val root = mapper.createObjectNode
    root.put("rows", fs.rows)
    val cols = root.putObject("cols")
    fs.cols.foreach { case (name, c) =>
      val o = cols.putObject(name)
      o.put("nulls", c.nulls)
      c.minN.foreach(v => o.put("minN", v))
      c.maxN.foreach(v => o.put("maxN", v))
      c.minS.foreach(v => o.put("minS", v))
      c.maxS.foreach(v => o.put("maxS", v))
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(json: String): Option[FileStats] =
    try {
      val root = mapper.readTree(json)
      val cols = scala.collection.mutable.Map.empty[String, ColStat]
      val it = root.get("cols").properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val o = e.getValue
        def optD(f: String) = Option(o.get(f)).map(_.asDouble)
        def optS(f: String) = Option(o.get(f)).map(_.asText)
        cols(e.getKey) = ColStat(o.get("nulls").asLong,
          optD("minN"), optD("maxN"), optS("minS"), optS("maxS"))
      }
      Some(FileStats(root.get("rows").asLong, cols.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Columns worth tracking: top-level numerics and strings (the key
    * domains the engine filters on). Dotted names would collide with
    * nested-field resolution — skipped.
    */
  private def statFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter { f =>
      !f.name.contains(".") && (f.dataType match {
        case _: NumericType => true
        case StringType     => true
        case _              => false
      })
    }

  /** One distributed aggregation over the freshly written files, grouped by
    * file — the result is one row per file (KB-scale collect, never
    * data-scale). Cost: a second scan of the NEW data only, the same
    * price Iceberg/Delta writers pay to populate their manifests.
    */
  def collect(spark: SparkSession, files: Seq[String]): Map[String, FileStats] = {
    if (files.isEmpty) return Map.empty
    val df = spark.read.parquet(files: _*)
    val fields = statFields(df.schema)
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val isNum = f.dataType != StringType
      Seq(
        (if (isNum) min(c).cast(DoubleType) else min(c)).as(s"mn$i"),
        (if (isNum) max(c).cast(DoubleType) else max(c)).as(s"mx$i"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nu$i"))
    }
    val rows = df
      .groupBy(input_file_name().as("__file"))
      .agg(count(lit(1L)).as("__rows"), aggs: _*)
      .collect()
    rows.map { r =>
      val cols = fields.zipWithIndex.map { case (f, i) =>
        val nulls = r.getAs[Long](s"nu$i")
        val st =
          if (f.dataType == StringType)
            ColStat(nulls, None, None,
              Option(r.getAs[String](s"mn$i")), Option(r.getAs[String](s"mx$i")))
          else {
            val mn = Option(r.getAs[java.lang.Double](s"mn$i")).map(d => Math.nextDown(d.doubleValue))
            val mx = Option(r.getAs[java.lang.Double](s"mx$i")).map(d => Math.nextUp(d.doubleValue))
            ColStat(nulls, mn, mx, None, None)
          }
        f.name -> st
      }.toMap
      normalizePath(r.getAs[String]("__file")) -> FileStats(r.getAs[Long]("__rows"), cols)
    }.toMap
  }

  /** input_file_name() yields a URI (file:///...); manifests store plain
    * filesystem paths — normalize for the lookup.
    */
  def normalizePath(s: String): String =
    if (s.contains(":/")) java.nio.file.Paths.get(java.net.URI.create(s)).toString else s
}
