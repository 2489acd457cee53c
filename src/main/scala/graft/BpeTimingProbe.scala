package graft

/** One-off timing evidence for the driver-bounded BPE trainer (NOTES.md):
  * nMerges=1000 over the sf0.01 corpus, in-memory loop vs the
  * per-merge-job distributed loop. Parity of outputs is asserted too —
  * the same check PipelineOpsSpec pins at 25 merges, here at real vocab
  * depth.
  */
object BpeTimingProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    // documents' synthetic vocabulary exhausts after ~90 merges — union
    // the events props payloads (numeric-rich, large vocab) so the probe
    // actually reaches real-tokenizer merge depth
    val d = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.{col, concat_ws}
    val docs = Tables.documents(spark, d)
      .select(col("text"))
      .unionByName(Tables.events(spark, d).select(col("props").as("text")))
      .unionByName(Tables.lineitem(spark, d).select(concat_ws(" ",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice")).as("text")))
    val nMerges = args.headOption.map(_.toInt).getOrElse(1000)
    import graft.operators.Bpe
    val t0 = System.nanoTime()
    val mem = Bpe.trainMergesAuto(docs, nMerges)
    val tMem = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-probe] in-memory: ${mem.length} merges in $tMem%.1f s")
    val t1 = System.nanoTime()
    val dist = Bpe.trainMergesList(docs, nMerges)
    val tDist = (System.nanoTime() - t1) / 1e9
    println(f"[bpe-probe] distributed: ${dist.length} merges in $tDist%.1f s")
    println(f"[bpe-probe] speedup ${tDist / tMem}%.0f x, parity ${mem == dist}")
    spark.stop()
  }
}
