package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dev-only timing probe (not part of CI assertions; kept cheap). */
class PerfScratch extends AnyFunSuite {
  lazy val spark = GraftSession.builder().getOrCreate()

  ignore("e2e2 stage timing at sf0.1") {
    val d = "/root/testdata/sf0.1"
    def timeNoop(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions.col
    def raw() = graft.queries.EndToEndQueries.ordersAsRawProbe(spark, d)
    timeNoop("payload build only")(raw())
    timeNoop("payload build again")(raw())
    val staged = graft.etl.Normalize.toStaging(graft.etl.Normalize(raw()))
    timeNoop("normalize 4 cols")(staged.select(col("date"), col("payment_date"), col("type"), col("total_rub")))
    timeNoop("full e2e2")(SparkEntry.registry("e2e2_financials_mart").fn(spark, d))
  }
}
