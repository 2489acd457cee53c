package graft

/** Round-13 optimization evidence: writes plans/r13/<query>_<suffix>.txt
  * with the formatted physical plan of each named query at sf0.01.
  * Usage: sbt "Test/runMain graft.DumpPlansR13 <suffix> <query> [query ...]"
  * (suffix is "before" on the pre-optimization commit, "after" on HEAD).
  */
object DumpPlansR13 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlansR13 <suffix> <query>...")
    val suffix = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.01"
    val dir = java.nio.file.Paths.get("plans/r13")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      val df = SparkEntry.registry(n).fn(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plans] wrote plans/r13/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
