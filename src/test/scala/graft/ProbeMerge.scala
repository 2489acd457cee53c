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
    // 3. merged-serve ratio (the d30 surface): an incremental serve from
    //    the merged store vs from the fresh single-build store — the two
    //    must cost the same (structurally identical plans) or the fold
    //    has quietly degraded the serving shape
    val odd = docs.filter(col("doc_id") % 2 === 1)
    def serveTime(st: graft.etl.ParquetTableStore): Double = {
      graft.operators.DedupIndexStore.pairsIncremental(st, odd, 3, 0.8).count() // warm
      (1 to 2).map(_ => time(
        graft.operators.DedupIndexStore.pairsIncremental(st, odd, 3, 0.8).count())).min
    }
    val tSM = serveTime(a); val tSF = serveTime(f)
    println(f"SERVE sf=$sfDir merged=$tSM%.2f fresh=$tSF%.2f " +
      f"merged_over_fresh=${tSM / tSF}%.2f")
    // 4. retract timing (the takedown verb): forget 1/8 of the indexed
    //    docs from the merged store vs a never-indexed fresh build over
    //    the remaining corpus — retract must stay cheaper than the
    //    rebuild it replaces (it re-derives from stored sets, no corpus
    //    re-read/re-shingle)
    val goneIds = even.filter(col("doc_id") % 8 === 0).select(col("doc_id"))
    val tR = time(graft.operators.DedupIndexStore.retract(a, goneIds))
    val g = fresh("g")
    val tRB = time(graft.operators.DedupIndexStore.build(g,
      even.filter(col("doc_id") % 8 =!= 0), 3, 0.8, 0.8))
    println(f"RETRACT sf=$sfDir retract=$tR%.2f rebuild_without=$tRB%.2f " +
      f"retract_over_rebuild=${tR / tRB}%.2f")
    // 5. semantic-state fold (the sem4 surface): central train + frozen
    //    shard builds + semanticMerge vs a one-shot buildSemanticState
    //    over the union. The fold re-scores only CROSS-shard cell pairs
    //    (≈ half the pair work at 2 shards) and re-closes on the delta,
    //    so it should track the one-shot's pair stage — the scale win is
    //    the embarrassingly-parallel shard builds upstream, as with the
    //    lexical index.
    val emb = Tables.embeddings(spark, sfDir).cache()
    val evenE = emb.filter(col("vec_id") % 2 === 0)
    val oddE = emb.filter(col("vec_id") % 2 === 1)
    val cents = graft.operators.Similarity.labelCentroids(emb)
    val sa = fresh("sema"); val sb = fresh("semb")
    val tSA = time(graft.operators.Similarity
      .buildSemanticStateFrozen(sa, evenE, cents, 0.3))
    val tSB = time(graft.operators.Similarity
      .buildSemanticStateFrozen(sb, oddE, cents, 0.3))
    val tSM2 = time(graft.operators.Similarity.semanticMerge(sa, sb, 0.3))
    val so = fresh("semone")
    val tSO = time(graft.operators.Similarity.buildSemanticState(so, emb, 0.3))
    println(f"SEM sf=$sfDir shard_a=$tSA%.2f shard_b=$tSB%.2f merge=$tSM2%.2f " +
      f"one_shot=$tSO%.2f merge_over_oneshot=${tSM2 / tSO}%.2f")
    // 6. semantic retract vs never-indexed rebuild (the sem3 claim)
    val goneE = emb.filter(col("vec_id") % 8 === 0).select(col("vec_id"))
    val tSR = time(graft.operators.Similarity.semanticRetract(sa, goneE))
    val sr = fresh("semr")
    val tSRB = time(graft.operators.Similarity.buildSemanticState(sr,
      emb.filter(col("vec_id") % 8 =!= 0), 0.3))
    println(f"SEMRETRACT sf=$sfDir retract=$tSR%.2f rebuild_without=$tSRB%.2f " +
      f"retract_over_rebuild=${tSR / tSRB}%.2f")
    spark.stop()
  }
}
