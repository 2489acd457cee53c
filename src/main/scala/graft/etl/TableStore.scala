package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction for the layer tables (SURVEY §7.3): plain Parquet
  * with tmp-dir + atomic-swap rewrites. Isolates the upsert mechanics so an
  * ACID format's MERGE can slot in without touching pipeline logic.
  */
trait TableStore {
  def exists(name: String): Boolean
  def read(name: String): DataFrame
  def overwrite(name: String, df: DataFrame): Unit
  def append(name: String, df: DataFrame): Unit
}

final class ParquetTableStore(spark: SparkSession, root: String) extends TableStore {
  private def path(name: String) = s"$root/$name"

  override def exists(name: String): Boolean =
    Files.exists(Paths.get(path(name)))

  override def read(name: String): DataFrame =
    spark.read.parquet(path(name))

  /** Write to a temp dir, then swap: the read path never observes a
    * half-written table (daily-batch contract; a lakehouse deployment
    * would use an ACID table format instead).
    */
  override def overwrite(name: String, df: DataFrame): Unit = {
    val tmp = path(name + "__tmp")
    val dst = Paths.get(path(name))
    val old = Paths.get(path(name + "__old"))
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    if (Files.exists(dst)) {
      deleteRecursive(old)
      Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(tmp), dst, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
    // drop the session's cached file listing for this path — it still
    // points at the pre-swap part files (metadataCacheTTL is infinite)
    spark.catalog.refreshByPath(path(name))
  }

  override def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
}

/** Bucketed catalog tables for co-located joins (SURVEY §4.1 pushdown row):
  * two tables bucketed+sorted on the same key join with NO shuffle — at
  * 100 TB this turns the nightly staging⋈raw reconciliations from a full
  * exchange of both sides into a local merge per bucket. Bucketing needs
  * the catalog API (bucketBy + saveAsTable), hence separate from the
  * path-based ParquetTableStore.
  */
final class BucketedStore(spark: SparkSession) {
  def write(table: String, df: DataFrame, bucketCols: Seq[String], numBuckets: Int): Unit = {
    // an in-memory catalog restarts empty while the warehouse dir persists;
    // clear both so Overwrite never trips over an orphaned location
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = Paths.get(wh, table)
    if (Files.exists(loc)) {
      Files.walk(loc).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(table: String): DataFrame = spark.table(table)
}
