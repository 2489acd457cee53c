package graft

// Dev scratch probe (runMain graft.ProbeMerge) — not a registered test.
// Kept because it is the minimal reproduction of the Spark 4.1
// spark.sql.unionOutputPartitioning hazard (see NOTES.md round 10 and
// GraftSession): with the conf at its default, UNION printed 500 rows
// but dedup returned 375 and M2 showed a non-idempotent re-merge; with
// the conf off (GraftSession pins it), dedup=250 and M2 is a no-op.
object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").cache()
    val even = docs.filter(col("doc_id") % 2 === 0)
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    def fresh(tag: String) = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory(s"probe-mrg-$tag").toString)
    val a = fresh("a"); val b = fresh("b")
    graft.operators.DedupIndexStore.build(a, e1, 3, 0.8, 0.8)
    graft.operators.DedupIndexStore.build(b, e2, 3, 0.8, 0.8)
    println(s"PRE  a.sets=${a.read("sets").count()} b.sets=${b.read("sets").count()}")
    graft.operators.DedupIndexStore.merge(a, b)
    println(s"M1   a.sets=${a.read("sets").count()} distinct=${a.read("sets").select("doc_id").distinct().count()}")
    graft.operators.DedupIndexStore.merge(a, b)
    println(s"M2   a.sets=${a.read("sets").count()} distinct=${a.read("sets").select("doc_id").distinct().count()}")
    // isolate: union of bucketed reads + dropDuplicates, no staging
    val u = a.readBucketed("sets", Seq("doc_id"), 32)
      .unionByName(b.readBucketed("sets", Seq("doc_id"), 32))
    println(s"UNION rows=${u.count()} dedup=${u.dropDuplicates("doc_id").count()}")
    u.dropDuplicates("doc_id").explain()
    spark.stop()
  }
}
