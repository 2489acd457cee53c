package graft

// Dev scratch probe (runMain graft.ProbeD22 [sfDir]) — adjudicates the
// round-10 verdict's d22 question: did the (correct)
// spark.sql.unionOutputPartitioning=false fix add the ~1.2 s by forcing
// an exchange back onto stored+stored union paths, and does a bucket-
// column DISTRIBUTE BY recover the co-located plan safely?
//
// Runs d22's exact registered body twice — conf pinned false (the
// GraftSession contract) vs flipped true (UNSAFE, throwaway session
// only) — and reports wall time, exchange counts in the final plan, and
// whether the answers agree (on this query they do: d22's downstream
// keys are doc_id, the bucket column, and every colliding key pair sits
// in the SAME child bucket file pair — the benign-elision case; the
// pin stays because the hazard is silent where keys collide ACROSS
// children, as in ProbeMerge's repro).
object ProbeD22 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    def runOnce(tag: String): Unit = {
      val docs = Tables.documents(spark, sfDir)
      val existing = docs.filter(col("doc_id") % 2 === 0)
      val prev = graft.operators.TextDedup.ensureKeep(spark, sfDir, existing,
        n = 3, minContainment = 0.8, tag = "even")
      val q = graft.operators.TextDedup.containmentKeepIncremental(prev, existing,
        docs.filter(col("doc_id") % 2 === 1), n = 3, minContainment = 0.8)
      // warmup then min-of-2, through the BENCH execution path (noop
      // sink — full plan, no count-side pruning)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        (t, 0L)
      }
      val plan = q.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(f"D22PROBE $tag%-6s time_min=${times.map(_._1).min}%.2f " +
        f"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        s"rows=${times.head._2} exchanges=$exchanges")
    }
    println(s"conf=${spark.conf.get("spark.sql.unionOutputPartitioning")}")
    runOnce("false")
    spark.conf.set("spark.sql.unionOutputPartitioning", "true")
    runOnce("true")
    spark.conf.set("spark.sql.unionOutputPartitioning", "false")
    spark.stop()
  }
}
