package graft

/** Round-13 fixed-cost attribution probe (dev tool): run named queries
  * several times in one warm JVM and print per-run wall time with the
  * job/stage/task counts — the decomposition behind the "per-query
  * fixed cost" line in OPTIMIZATION_r13.md.
  * Usage: sbt "Test/runMain graft.ProbeFixedCost <query> [query ...]"
  */
object ProbeFixedCost {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq else Seq("a1_monthly_pnl")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      Seq("true", "false").foreach { aqe =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        (1 to 5).foreach { i =>
          val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
          val t = System.nanoTime
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime - t) / 1e9
          org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
          println(f"[probe] $n aqe=$aqe run$i $dt%.3f s jobs=${jobs.get - j0} " +
            f"stages=${stages.get - s0} tasks=${tasks.get - t0}")
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
