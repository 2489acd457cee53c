package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Dev-only timing probe (not part of CI assertions; kept cheap). */
class PerfScratch extends AnyFunSuite {
  lazy val spark = GraftSession.builder().getOrCreate()

  ignore("d4 bucket skew at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("simhash narrow")(TextDedup.simhash(docs).count())
    val sig = TextDedup.simhash(docs)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 8).map(k =>
        shiftright(col("simhash"), k * 8).bitwiseAND(0xFFL)): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_val"))
    val big = banded.groupBy("band", "band_val").count().orderBy(desc("count"))
    big.show(10, false)
    val totalPairs = big.selectExpr("sum(count * (count - 1) / 2) as p").head()
    println("[perf] total pre-dedup pairs: " + totalPairs)
    time("pairs full")(TextDedup.simhashPairs(docs, 7).count())
  }
}
