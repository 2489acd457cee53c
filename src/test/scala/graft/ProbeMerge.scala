package graft

// Dev scratch probe (runMain graft.ProbeMerge [sfDir]) — not a registered
// test. Two jobs:
//  1. Minimal reproduction of the Spark 4.1
//     spark.sql.unionOutputPartitioning hazard (see NOTES.md round 10 and
//     GraftSession): with the conf at its default, UNION printed 500 rows
//     but dedup returned 375 and M2 showed a non-idempotent re-merge; with
//     the conf off (GraftSession pins it), dedup=250 and M2 is a no-op.
//  2. Scaling evidence for the merge doctrine: time shard builds + merge
//     vs a fresh build over the union corpus at the given SF — merge must
//     stay strictly cheaper than the fresh build (it pays the same
//     shingle exchange but skips the corpus text re-read + re-shingle).
object ProbeMerge {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables.documents(spark, sfDir).cache()
    val even = docs.filter(col("doc_id") % 2 === 0)
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    def fresh(tag: String) = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory(s"probe-mrg-$tag").toString)
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // 1. hazard repro (counts must read 250/250 with the conf pinned off)
    val a = fresh("a"); val b = fresh("b")
    val tA = time(graft.operators.DedupIndexStore.build(a, e1, 3, 0.8, 0.8))
    val tB = time(graft.operators.DedupIndexStore.build(b, e2, 3, 0.8, 0.8))
    println(s"PRE  a.sets=${a.read("sets").count()} b.sets=${b.read("sets").count()}")
    val tM = time(graft.operators.DedupIndexStore.merge(a, b))
    println(s"M1   a.sets=${a.read("sets").count()} distinct=${a.read("sets").select("doc_id").distinct().count()}")
    graft.operators.DedupIndexStore.merge(a, b)
    println(s"M2   a.sets=${a.read("sets").count()} distinct=${a.read("sets").select("doc_id").distinct().count()}")
    val u = a.readBucketed("sets", Seq("doc_id"), 32)
      .unionByName(b.readBucketed("sets", Seq("doc_id"), 32))
    println(s"UNION rows=${u.count()} dedup=${u.dropDuplicates("doc_id").count()}")
    // 2. merge vs fresh-union-build timing at this SF
    val f = fresh("f")
    val tF = time(graft.operators.DedupIndexStore.build(f, even, 3, 0.8, 0.8))
    println(f"TIME sf=$sfDir build_shard_a=$tA%.2f build_shard_b=$tB%.2f " +
      f"merge=$tM%.2f fresh_union=$tF%.2f merge_over_fresh=${tM / tF}%.2f")
    spark.stop()
  }
}
