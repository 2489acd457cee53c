package graft

import org.apache.spark.sql.functions._

/** Dev-only scaling probe for the split service (run manually:
  * `sbt "Test/runMain graft.ProbeSplitServe"`): per-wave cost of
  * `Curation.splitServe` for a fixed 40-doc batch against a corpus-built
  * state at sf0.01 vs sf0.1 (12× corpus) — the NOTES.md probe-table row.
  * Two distinct batches are timed per scale (serve absorbs its batch, so
  * a re-serve of the same one would measure the 0-row replay path).
  */
object ProbeSplitServe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, sf)
      val corpus = docs.filter(col("doc_id") % 100 >= 2)
      val b1 = docs.filter(col("doc_id") % 100 === 0).limit(40).cache()
      val b2 = docs.filter(col("doc_id") % 100 === 1).limit(40).cache()
      b1.count(); b2.count()
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_split").toString
      val store = new graft.etl.ParquetTableStore(spark, s"$tmp/state")
      val t0 = System.nanoTime()
      graft.operators.Curation.splitServe(store, corpus, 0.8)(_ => ())
      val tBuild = (System.nanoTime() - t0) / 1e9
      def wave(b: org.apache.spark.sql.DataFrame): Double = {
        val t = System.nanoTime()
        val n = graft.operators.Curation.splitServe(store, b, 0.8)(_.count())
        val dt = (System.nanoTime() - t) / 1e9
        require(n > 0, "probe batch came back absorbed — not a serve measurement")
        dt
      }
      println(f"[probe] $sf corpus=${corpus.count()} build=$tBuild%.2f s " +
        f"wave1=${wave(b1)}%.2f s wave2=${wave(b2)}%.2f s (40-doc batches)")
    }
    spark.stop()
  }
}
