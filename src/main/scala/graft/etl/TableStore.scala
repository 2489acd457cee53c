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
