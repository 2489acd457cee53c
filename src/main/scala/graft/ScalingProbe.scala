package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Empirical check of the delta-sized-cost claim the incremental dedup
  * chain (d12/d13/d21/d22) rests on: with the BATCH SIZE held constant,
  * per-batch time must track the batch, not the corpus — the property
  * that lets a 100 TB corpus absorb a daily slice without ever paying
  * corpus-shaped work again. Runs the per-batch stage of each
  * incremental operator against a fixed 40-doc batch over the sf0.01
  * corpus (400 existing docs) and the sf0.1 corpus (4 900 existing docs,
  * 12×), prints seconds per stage per scale. Results are recorded in
  * NOTES.md (round 7).
  *
  * Setup work (batch CC / batch containment over the existing corpus to
  * create the stored state an incremental deployment would already have)
  * is cached and NOT timed.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def probe(sfDir: String): Map[String, Double] = {
      val docs = Tables.documents(spark, sfDir).cache()
      val n = docs.count()
      // constant batch: the 40 lowest doc_ids (small enough that the
      // serve paths run their deployment shape — bloom prune engaged —
      // at BOTH probe scales); corpus = the rest
      val batch = docs.orderBy(col("doc_id")).limit(40).cache()
      batch.count()
      val corpus = docs.join(batch.select(col("doc_id")), Seq("doc_id"), "left_anti").cache()
      val nCorpus = corpus.count()
      println(s"[probe] $sfDir: $n docs, corpus $nCorpus, batch 40")
      // stored state a deployment would already hold (not timed)
      val prevLabels = TextDedup.connectedComponents(
        TextDedup.prefixFilterPairs(corpus, 3, 0.8)).cache()
      prevLabels.count()
      val prevCont = TextDedup.containmentKeep(corpus, 3, 0.8).cache()
      prevCont.count()
      // warm (JIT + codegen) then time the per-batch stages
      // the indexed serve path (d23/d24): corpus state persisted once,
      // built here untimed — the state an indexed deployment already has
      val idxDir = java.nio.file.Files.createTempDirectory("graft_probe_idx").toString
      val idx = new graft.etl.ParquetTableStore(spark, idxDir)
      graft.operators.DedupIndexStore.build(idx, corpus, 3, 0.8, 0.8)
      val sfxDir = java.nio.file.Files.createTempDirectory("graft_probe_sfx").toString
      val sfx = new graft.etl.ParquetTableStore(spark, sfxDir)
      graft.operators.SuffixIndexStore.build(sfx, corpus, 8, 32)
      val mediaDir = java.nio.file.Files.createTempDirectory("graft_probe_media").toString
      val media = new graft.etl.ParquetTableStore(spark, mediaDir)
      def phashOf(df: DataFrame) = graft.multimodal.Media.perceptualHash(
        graft.multimodal.Media.documentsAsMedia(spark, df)).toDF()
      graft.multimodal.MediaIndexStore.build(media, phashOf(corpus), 7)
      val batchSig = phashOf(batch).cache(); batchSig.count()
      // graph fabric (g1/g2's shape) over the corpus near-dup pairs —
      // NOT per-batch: PageRank carries node-sized per-iteration state,
      // so its cost is EXPECTED to grow with the corpus (documented
      // growth; the probe pins that the growth is ~linear, not worse,
      // and that the size-gated no-forced-broadcast shape holds)
      val pairs = TextDedup.prefixFilterPairs(corpus, 3, 0.8)
        .select(col("id_a"), col("id_b")).cache()
      pairs.count()
      val und = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val seeds = corpus.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("node"))
      val stages = Seq[(String, () => Unit)](
        "g1_pagerank" -> (() => noop(
          graft.operators.Graph.pageRankMicro(und, 5))),
        "g2_personalized" -> (() => noop(
          graft.operators.Graph.personalizedPageRankMicro(und, seeds, 5))),
        "d12_pairs" -> (() => noop(
          TextDedup.prefixFilterPairsIncremental(corpus, batch, 3, 0.8))),
        // recompute contrast: the pre-index cluster-maintenance path
        // (corpus re-shingle per batch — its ratio documents WHY the
        // registered d13 now serves from the index instead)
        "d13_recompute_clusters" -> (() => noop(TextDedup.ccIncremental(prevLabels,
          TextDedup.prefixFilterPairsIncremental(corpus, batch, 3, 0.8)))),
        // deployment path: the registered d13 — delta pairs from the
        // bucketed index, then delta-graph CC; must stay ~flat at 12x
        "d13_indexed_clusters" -> (() => noop(TextDedup.ccIncremental(prevLabels,
          graft.operators.DedupIndexStore.pairsIncremental(idx, batch, 3, 0.8)))),
        "d21_d22_containment" -> (() => noop(
          TextDedup.containmentKeepIncremental(prevCont, corpus, batch, 3, 0.8))),
        "d23_indexed_pairs" -> (() => noop(
          graft.operators.DedupIndexStore.pairsIncremental(idx, batch, 3, 0.8))),
        "d24_indexed_cont" -> (() => noop(
          graft.operators.DedupIndexStore.containmentIncremental(idx, batch, 3, 0.8))),
        // exact-substring family: per-batch recompute re-sorts the whole
        // corpus suffix table (its growth term); the indexed serve reads
        // only batch-touched prefix groups from the stored state
        "d25_recompute_spans" -> (() => noop(
          graft.operators.SuffixDedup.maxMatchSpans(
            corpus.unionByName(batch), 8, 32))),
        "d26_indexed_suffix" -> (() => noop(
          graft.operators.SuffixIndexStore.servedSpans(sfx, batch))),
        // media family: recompute re-bands the whole corpus per run;
        // the band index serves batch-shaped
        "mm3_recompute_phash" -> (() => noop(
          TextDedup.hammingBandPairs(
            phashOf(docs).select(col("media_id").as("doc_id"),
              col("phash").as("simhash")), 7))),
        "mm4_indexed_phash" -> (() => noop(
          graft.multimodal.MediaIndexStore.pairsIncremental(media, batchSig))))
      val out = stages.map { case (name, f) =>
        f() // warmup
        name -> (1 to 2).map(_ => time(f())).min
      }.toMap
      docs.unpersist(); batch.unpersist(); corpus.unpersist()
      prevLabels.unpersist(); prevCont.unpersist(); pairs.unpersist()
      out
    }

    val small = probe("/root/testdata/sf0.01")
    val big = probe("/root/testdata/sf0.1")
    println(f"${"stage"}%-22s ${"sf0.01(s)"}%10s ${"sf0.1(s)"}%10s ${"ratio"}%7s  (corpus 12x)")
    small.keys.toSeq.sorted.foreach { k =>
      println(f"$k%-22s ${small(k)}%10.2f ${big(k)}%10.2f ${big(k) / small(k)}%7.2f")
    }
    spark.stop()
  }
}
