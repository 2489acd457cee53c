package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextDedup

/** Dev-only timing probe (not part of CI assertions; kept cheap). */
class PerfScratch extends AnyFunSuite {
  lazy val spark = GraftSession.builder().getOrCreate()

  ignore("time d4 stages at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("simhash only")(TextDedup.simhash(docs).count())
    time("simhash again")(TextDedup.simhash(docs).count())
    time("pairs")(TextDedup.simhashPairs(docs, 7).count())
    TextDedup.simhashPairs(docs, 7).explain("formatted")
  }
}
