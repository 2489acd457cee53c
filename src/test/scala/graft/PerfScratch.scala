package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dev-only timing probe (not part of CI assertions; kept cheap). */
class PerfScratch extends AnyFunSuite {
  lazy val spark = GraftSession.builder().getOrCreate()

  ignore("e2e1 plan inspection at sf0.1") {
    val df = SparkEntry.registry("e2e1_normalize_pipeline").fn(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val t0 = System.nanoTime()
    val plan = df.queryExecution.executedPlan.toString
    println(f"[perf] plan compile: ${(System.nanoTime() - t0) / 1e9}%.2f s, plan chars: ${plan.length}")
    println("[perf] contains md5: " + plan.contains("md5"))
    println("[perf] contains __s_total_usd (unused col): " + plan.contains("__s_total_usd"))
    def timeNoop(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions.col
    def norm() = graft.etl.Normalize(
      graft.queries.EndToEndQueries.ordersAsRawProbe(spark, "/root/testdata/sf0.1"))
    timeNoop("only raw_id")(norm().select(col("raw_id")))
    timeNoop("only date")(norm().select(col("date")))
    timeNoop("only type")(norm().select(col("type")))
    timeNoop("only client")(norm().select(col("client")))
    timeNoop("only total_rub")(norm().select(col("total_rub")))
    timeNoop("only payload_hash")(norm().select(col("payload_hash")))
    timeNoop("warn only")(norm().select(col("validation_warnings")))
  }
}
