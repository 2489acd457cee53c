package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val train = docs(
      1L -> "a b c d e f",      // contains benchmark 4-gram "c d e f"
      2L -> "x y z w v u",      // clean
      3L -> "c d e f g h",      // shares "c d e f" too
      4L -> "f e d c b a")      // reversed — no shared ordered gram
    val bench = docs(100L -> "q r c d e f s t")
    val got = Curation.decontaminate(train, bench, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }

  test("decontaminate counts each shared gram once per doc (distinct shingles)") {
    // "a b a b a b" has 4-grams {a b a b, b a b a} each appearing twice —
    // distinct-per-doc means multiplicity must NOT inflate the score
    val train = docs(1L -> "a b a b a b")
    val bench = docs(100L -> "a b a b")
    val got = Curation.decontaminate(train, bench, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L)) // only "a b a b" is in the benchmark set
  }

  test("repetition signals: permille math matches hand computation") {
    val d = docs(
      1L -> "a a a a",        // 4 words, 1 distinct → dup 750; bigram "a a" ×3 of 3 → 1000
      2L -> "a b c d",        // all distinct → dup 0; every bigram unique → 333
      3L -> "a b a b a")      // 5 words 2 distinct → dup 600; "a b" ×2 of 4 → 500
    val got = Curation.repetitionSignals(d)
      .as[(Long, Long, Long)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    assert(got(1L) == ((750L, 1000L)))
    assert(got(2L) == ((0L, 333L)))
    assert(got(3L) == ((600L, 500L)))
  }

  test("maskDigits redacts every digit and digitCount counts them") {
    val row = Seq(("call 555-0199 ext 7", "")).toDF("t", "pad")
      .select(Curation.maskDigits($"t"), Curation.digitCount($"t"))
      .as[(String, Int)].head()
    assert(row == (("call XXX-XXXX ext X", 8)))
  }

  test("mixSample is deterministic and honors the acceptance rate") {
    val d = (1L to 400L).map(i => (i, s"doc number $i payload")).toDF("doc_id", "text")
    val kept = Curation.mixSample(d, lit(400L)).as[(Long, String)].collect().toSet
    val again = Curation.mixSample(d, lit(400L)).as[(Long, String)].collect().toSet
    assert(kept == again)                      // pure function of content
    assert(kept.size > 100 && kept.size < 220) // ~40% of 400
    val all = Curation.mixSample(d, lit(1000L)).count()
    assert(all == 400L)                        // rate 1000 keeps everything
  }

  test("upsample replicates deterministically; rate 1000 is a pass-through") {
    val d = (1L to 300L).map(i => (i, s"payload $i")).toDF("doc_id", "text")
    val once = Curation.upsample(d, lit(1000L))
    assert(once.count() == 300L)
    assert(once.agg(max($"copy_idx")).head().getLong(0) == 0L)
    val up = Curation.upsample(d, lit(2500L)).cache()
    val n = up.count()
    assert(n > 600 && n < 900, s"2.5x of 300 docs gave $n rows") // ~750
    assert(up.groupBy($"doc_id").count().agg(min($"count")).head().getLong(0) >= 2L)
    // deterministic: same replica set every run
    assert(up.select($"doc_id", $"copy_idx").collect().toSet ==
      Curation.upsample(d, lit(2500L)).select($"doc_id", $"copy_idx").collect().toSet)
    // rate 0 drops everything (downsample-to-nothing edge)
    assert(Curation.upsample(d, lit(0L)).count() == 0L)
  }

  test("tokenChunks covers every word with stride windows, last chunk short") {
    val d = docs(1L -> (1 to 50).map(i => s"w$i").mkString(" "))
    val got = Curation.tokenChunks(d, chunkSize = 32, stride = 24)
      .orderBy($"chunk_start")
      .as[(Long, Int, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 1, 32L, "w1"),   // words 1..32
      (1L, 25, 26L, "w25"), // words 25..50 (short tail)
      (1L, 49, 2L, "w49"))) // stride lands at 49 → 2-word tail
    // coverage: chunk starts advance by stride while ≤ n
    assert(got.map(_._2).toSeq == Seq(1, 25, 49))
  }

  test("chunking + masking stay narrow: no shuffle beyond fan's split repair") {
    // Par.fan's RoundRobin repartition on the single-row-group test file is
    // expected (and a no-op on a real multi-split lake); what must NOT
    // appear is a hash or range exchange — the operators themselves are
    // pure per-row projections.
    val d = Tables.documents(spark, sfTiny)
    val chunkPlan = Curation.tokenChunks(d, 32, 24).queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("hashpartitioning") && !chunkPlan.contains("rangepartitioning"),
      s"chunking must not hash/range shuffle:\n$chunkPlan")
    val maskPlan = d.select(Curation.maskDigits(col("text")))
      .queryExecution.executedPlan.toString
    assert(!maskPlan.contains("Exchange"), s"masking must not shuffle:\n$maskPlan")
  }

  test("profile counts nulls/distincts and renders min-max without an Expand") {
    import graft.operators.Profile
    import graft.operators.Profile.ColSpec
    val df = Seq(
      (Some("a"), Some(1.5)), (None, Some(2.25)), (Some("b"), None), (Some("a"), Some(2.25)))
      .toDF("s", "v")
    val got = Profile.profile(df, Seq(
        ColSpec("s"), ColSpec("v", Profile.decimalRender)))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("s") == ((1L, 2L, "a", "b")))
    assert(got("v") == ((1L, 2L, "1.5000", "2.2500")))
    // per-column single-distinct passes, no joins — and critically no
    // Expand: several exact distincts in ONE aggregate would N× the rows
    // through the shuffle (the r7 prof1 cost), while per-column branches
    // stay single-width and columnar pruning keeps total I/O equal
    val plan = Profile.profile(df, Seq(ColSpec("s"), ColSpec("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand") && !plan.contains("Join"),
      s"profile must not Expand or join:\n$plan")
  }

  test("decontaminate broadcasts the benchmark gram side") {
    val d = Tables.documents(spark, sfTiny)
    val plan = Curation.decontaminate(
        d.where(pmod(col("doc_id"), lit(97L)) =!= 0),
        d.where(pmod(col("doc_id"), lit(97L)) === 0), n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
  }

  test("DSIR: target docs score higher, resampling enriches the target slice") {
    import graft.operators.Dsir
    val docs = Tables.documents(spark, sfTiny)
    val isEn = col("lang") === "en"
    val w = Dsir.importanceWeights(docs, isEn).join(
      docs.select(col("doc_id"), isEn.as("is_t")), Seq("doc_id")).cache()
    // separation: the mean log importance weight of target docs must
    // exceed the non-target mean — the LLR models score their own slice
    // higher by construction unless the feature hash destroyed signal
    val means = w.groupBy(col("is_t")).agg(avg(col("weight_micro")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} must beat raw mean ${means(false)}")
    // the resample enriches the target fraction above its base rate
    val baseRate = docs.filter(isEn).count().toDouble / docs.count()
    val sample = Dsir.resample(docs, isEn, k = 100)
      .join(docs.select(col("doc_id"), isEn.as("is_t")), Seq("doc_id"))
    val sampleRate = sample.filter(col("is_t")).count() / 100.0
    assert(sampleRate > baseRate,
      f"sample target-rate $sampleRate%.2f must beat base rate $baseRate%.2f")
    // deterministic: two invocations agree exactly (hash-derived uniforms)
    val again = Dsir.resample(docs, isEn, k = 100).collect().map(_.getLong(0)).toSet
    assert(again == sample.select(col("doc_id")).collect().map(_.getLong(0)).toSet)
    // scale contract: the ratio table is broadcast, the top-k is a
    // TakeOrdered — never a global sort of the corpus
    val plan = Dsir.resample(docs, isEn, k = 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$plan")
    w.unpersist()
  }

  private def embRows(rows: (Long, Seq[Double], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("semantic decontamination: aligned vectors flagged, orthogonal clean, zero-shuffle plan") {
    import graft.operators.Similarity
    val e = embRows(
      (1L, Seq(1.0, 0.0, 0.0), 0), // == bench vec 10 → cos 1.0
      (2L, Seq(0.0, 1.0, 0.0), 0), // ⊥ both bench vecs → cos 0
      (3L, Seq(0.6, 0.0, 0.8), 1), // cos 0.6 to bench 10
      (10L, Seq(1.0, 0.0, 0.0), 9),
      (11L, Seq(0.0, 0.0, 1.0), 9))
    val bench = Similarity.collectBenchmark(e.where(col("label") === 9))
    assert(bench.length == 2)
    val got = Similarity.semanticContamination(
        e.where(col("label") =!= 9), bench, minCos = 0.7)
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._3).toSeq == Seq(1L -> 1L, 2L -> 0L, 3L -> 1L))
    assert(math.abs(got(0)._2 - 1.0) < 1e-9)
    assert(math.abs(got(2)._2 - 0.8) < 1e-9) // max over {0.6, 0.8} picks 0.8
    // scale contract: the benchmark rides as a literal — no join, no
    // exchange anywhere in the scoring scan
    val plan = Similarity.semanticContamination(
        e.where(col("label") =!= 9), bench, minCos = 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"contamination scan must be a narrow pass:\n$plan")
  }

  test("label prototypes: centroid-nearest ranks first, m bounds per label, WindowGroupLimit plan") {
    import graft.operators.Similarity
    val e = embRows(
      (1L, Seq(1.0, 0.0), 0),   // centroid of label 0 ≈ (0.75, 0.25)
      (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(1.0, 0.0), 0),
      (4L, Seq(0.0, 1.0), 0),   // the outlier — least prototypical
      (5L, Seq(0.0, 1.0), 1),
      (6L, Seq(0.1, 1.0), 1))
    val got = Similarity.labelPrototypes(e, m = 3)
      .as[(Int, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val lab0 = got.filter(_._1 == 0)
    assert(lab0.length == 3 && !lab0.map(_._2).contains(4L),
      s"outlier must fall outside top-3: ${lab0.mkString(",")}")
    assert(lab0.map(_._2).toSeq == Seq(1L, 2L, 3L), "vec_id tiebreak on equal cos")
    assert(got.filter(_._1 == 1).length == 2) // fewer rows than m → all kept
    val plan = Similarity.labelPrototypes(e, m = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-label top-m must plan as WindowGroupLimit:\n$plan")
  }

  test("token-budget recipe: targets sum to ~budget, repeat factors consistent") {
    val r = SparkEntry.registry("mx5_token_budget").fn(spark, sfTiny)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    val budget = 10000000L
    val sumTarget = r.map(_._3).sum
    // each source floor-truncates < 1 token-unit of its share
    assert(sumTarget <= budget && sumTarget >= budget - r.length,
      s"targets must partition the budget: $sumTarget vs $budget")
    r.foreach { case (src, nTok, target, epochsMilli, over) =>
      assert(epochsMilli == math.floor(target * 1000.0 / nTok).toLong, src)
      assert((over == 1L) == (epochsMilli > 1000L), src)
    }
  }

  test("split resolve: planted bridge adjudicated by majority; invariants; replay no-op") {
    import graft.operators.{DedupIndexStore, TextDedup}
    import graft.etl.ParquetTableStore
    // corpus of disjoint-vocabulary singletons; find two whose label
    // hash freezes them to DIFFERENT splits (guaranteed to exist among
    // a dozen hashes)
    val texts = (1L to 12L).map(i =>
      i -> (1 to 10).map(j => s"w${i}x$j").mkString(" ")).toMap
    val splitOf = texts.keys.toSeq.toDF("doc_id")
      .select($"doc_id", Curation.splitOfLabel($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    val (a, b) = (for {
      x <- texts.keys.toSeq.sorted; y <- texts.keys.toSeq.sorted
      if x < y && splitOf(x) != splitOf(y)
    } yield (x, y)).head
    // bridge shares half its 3-shingles with each side: J = 8/18 ≈ 0.44
    val bridge = texts(a) + " " + texts(b)
    val tmp = java.nio.file.Files.createTempDirectory("graft_resolve").toString
    val store = new ParquetTableStore(spark, s"$tmp/state")
    var outs = Map.empty[Long, String]
    def serve(batch: org.apache.spark.sql.DataFrame): Long =
      Curation.splitServe(store, batch, threshold = 0.4) { df =>
        outs = df.select($"doc_id", $"split").as[(Long, String)].collect().toMap
      }
    serve(docs(texts.toSeq.sortBy(_._1): _*))
    assert(outs == splitOf, "wave 1 must assign per-label hash splits")
    serve(docs(100L -> bridge))
    assert(outs == Map(100L -> "conflict"),
      s"bridge must quarantine, got $outs")
    // adjudicate: tie (1 vote each) → lexicographically smaller split;
    // the WHOLE cluster moves (the losing frozen member + the bridge)
    val winner = Seq(splitOf(a), splitOf(b)).min
    val changed = Curation.resolveConflictsInStore(store)
    assert(changed == 2L, s"loser + bridge must move, got $changed")
    val after = store.read("splits")
      .as[(Long, String)].collect().toMap
    assert(Seq(a, b, 100L).forall(after(_) == winner))
    assert(!after.valuesIterator.contains("conflict"))
    (texts.keySet - a - b).foreach(i => assert(after(i) == splitOf(i),
      s"untouched cluster $i must keep its split"))
    // no-straddle invariant over the whole corpus ∪ batch
    val all = docs((texts.toSeq :+ (100L -> bridge)).sortBy(_._1): _*)
    TextDedup.jaccardPairs(all, n = 3, minJaccard = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .foreach { case (x, y) =>
        assert(after(x) == after(y), s"pair ($x,$y) straddles splits") }
    // replay no-op: the quarantine is empty post-resolution
    assert(Curation.resolveConflictsInStore(store) == 0L)
    // future member of the resolved cluster ADOPTS (census is size 1)
    serve(docs(200L -> texts(a)))
    assert(outs == Map(200L -> winner),
      s"future member must adopt the resolved split, got $outs")
  }

  test("export reconcile after split resolve: admission re-derived, flips pinned, replay no-op") {
    import graft.etl.ParquetTableStore
    // ≥50-word Gopher-passing texts with disjoint vocabularies
    def text(i: Long) = "the a and of " + (1 to 56).map(j => s"r${i}z$j").mkString(" ")
    val splitOf = (1L to 60L).toDF("doc_id")
      .select($"doc_id", Curation.splitOfLabel($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    def pair(lo: String, hi: String, used: Set[Long]) = (for {
      x <- (1L to 60L).toSeq; y <- (1L to 60L).toSeq
      if x < y && splitOf(x) == lo && splitOf(y) == hi &&
        !used(x) && !used(y)
    } yield (x, y)).head
    // gain case: canonical x is 'val', mate 'train' → tie resolves to
    // 'train' (lexicographic min) → x becomes admissible post-resolve
    val (x, y) = pair("val", "train", Set.empty)
    // loss case: canonical x2 is 'train', mate 'test' → resolves 'test'
    val (x2, y2) = pair("train", "test", Set(x, y))
    val fillers = (1L to 60L).filter(i => !Set(x, y, x2, y2)(i)).take(6)
    val tmp = java.nio.file.Files.createTempDirectory("graft_reconcile").toString
    val store = new ParquetTableStore(spark, s"$tmp/state")
    def serve(b: org.apache.spark.sql.DataFrame) =
      Curation.exportServe(store, b, threshold = 0.4)(_ => ())
    serve(docs((Seq(x, y, x2, y2) ++ fillers).sorted.map(i => i -> text(i)): _*))
    serve(docs(
      1001L -> (text(x) + " " + text(y)),     // bridges val|train → conflict
      1002L -> (text(x2) + " " + text(y2))))  // bridges train|test → conflict
    def admitted() = store.read("admitted").select($"doc_id").as[Long].collect().toSet
    val arrivalAdmitted = admitted()
    // at arrival: singletons admitted iff train; bridges quarantined
    val trainFillers = fillers.filter(splitOf(_) == "train").toSet
    assert(arrivalAdmitted == trainFillers ++ Set(y, x2),
      s"arrival admission drifted: $arrivalAdmitted")
    assert(Curation.resolveConflictsInStore(store) > 0L)
    val (flipped, manifest) = Curation.exportReconcile(store)
    // +x (cluster resolved train, x canonical), −y (no longer canonical),
    // −x2 (cluster resolved test); y2 and the bridges were never in
    assert(flipped == 3L, s"expected 3 admission flips, got $flipped")
    assert(admitted() == trainFillers + x, s"post-reconcile: ${admitted()}")
    // manifest is the derived artifact over the reconciled admitted set
    def mset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, String)].collect().toSet
    assert(mset(manifest) ==
      mset(Curation.shardManifest(store.read("admitted"), "42", 1024L, 4L)))
    // replay: state already consistent
    assert(Curation.exportReconcile(store)._1 == 0L)
  }

  test("export lifecycle on the corpus (e2e13 fixture): quarantine fires, resolve clears it, reconcile flips") {
    import graft.etl.ParquetTableStore
    val base = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select($"doc_id", $"text")
    val bridges = base.as("a").join(base.as("b"),
        $"b.doc_id" === $"a.doc_id" + 2 && $"a.doc_id" % 20 === 2)
      .select(($"a.doc_id" + 100001L).as("doc_id"),
        concat($"a.text", lit(" "), $"b.text").as("text"))
    val all = base.unionByName(bridges)
    val tmp = java.nio.file.Files.createTempDirectory("graft_e2e13").toString
    val store = new ParquetTableStore(spark, s"$tmp/state")
    Curation.exportServe(store, all.filter($"doc_id" % 2 === 0), threshold = 0.45)(_ => ())
    Curation.exportServe(store, all.filter($"doc_id" % 2 === 1), threshold = 0.45)(_ => ())
    // the synthetic bridges must actually quarantine on the real corpus
    // — otherwise e2e13's resolution branch is vacuously green
    val preConflicts = store.read("splits")
      .filter($"split" === "conflict").count()
    assert(preConflicts > 0, "bridges failed to quarantine at sf0.001")
    val moved = Curation.resolveConflictsInStore(store)
    assert(moved >= preConflicts, s"resolve moved $moved < $preConflicts conflicts")
    // post-resolution invariants: no conflict survives, no cluster straddles
    val lab = store.read("splits")
      .join(store.read("clusters").withColumnRenamed("cluster_id", "cl"),
        Seq("doc_id"), "left")
      .withColumn("cid", coalesce($"cl", $"doc_id"))
    assert(lab.filter($"split" === "conflict").count() == 0)
    assert(lab.groupBy($"cid").agg(countDistinct($"split").as("ns"))
      .filter($"ns" >= 2).count() == 0, "a cluster still straddles splits")
    val (flipped, manifest) = Curation.exportReconcile(store)
    assert(flipped > 0, "resolution changed no admission — lifecycle is vacuous")
    assert(manifest.count() > 0)
    // fixed point: replaying any stage changes nothing
    assert(Curation.exportServe(store,
      all.filter($"doc_id" % 2 === 1), threshold = 0.45)(_ => ())._1 == 0L)
    assert(Curation.resolveConflictsInStore(store) == 0L)
    assert(Curation.exportReconcile(store)._1 == 0L)
  }

  test("export takedown on the corpus (e2e14 fixture): every layer forgets, admission flips in") {
    import graft.etl.ParquetTableStore
    val base = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val all = base.select($"doc_id", $"text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_e2e14").toString
    val store = new ParquetTableStore(spark, s"$tmp/state")
    Curation.exportServe(store, all.filter($"doc_id" % 2 === 0), threshold = 0.45)(_ => ())
    Curation.exportServe(store, all.filter($"doc_id" % 2 === 1), threshold = 0.45)(_ => ())
    val gone = base.filter($"doc_id" % 2 === 0 && $"source" === "src0")
      .select($"doc_id").as[Long].collect().toSet
    assert(gone.nonEmpty)
    val admittedBefore = store.read("admitted")
      .select($"doc_id").as[Long].collect().toSet
    val (flipped, manifest) = Curation.exportRetract(store,
      base.filter($"doc_id" % 2 === 0 && $"source" === "src0").select($"doc_id"))
    // every layer forgot the docs
    for (t <- Seq("sets", "splits", "gated", "admitted"))
      assert(store.read(t).filter($"doc_id".isin(gone.toSeq: _*)).count() == 0,
        s"$t still holds retracted docs")
    val admittedAfter = store.read("admitted")
      .select($"doc_id").as[Long].collect().toSet
    assert(admittedAfter.intersect(gone).isEmpty)
    // the takedown must PROMOTE at least one cluster-mate into the
    // export (the corpus's clique-shaped dup families guarantee a
    // retracted canonical has survivors) — not just shrink it
    assert(admittedAfter.diff(admittedBefore).nonEmpty,
      "no doc flipped INTO the export after its canonical was retracted")
    assert(flipped ==
      (admittedAfter.diff(admittedBefore) ++ admittedBefore.diff(admittedAfter)).size)
    assert(manifest.count() > 0)
    // replay: retracting the absent ids again is a no-op at every layer
    val (flipped2, _) = Curation.exportRetract(store,
      base.filter($"doc_id" % 2 === 0 && $"source" === "src0").select($"doc_id"))
    assert(flipped2 == 0L)
    assert(store.read("admitted").select($"doc_id").as[Long].collect().toSet
      == admittedAfter)
  }

  test("splitServe adopts a dedupidx-built store (no clusters table): selfPairs bootstrap") {
    import graft.operators.{DedupIndexStore, TextDedup}
    import graft.etl.ParquetTableStore
    val texts = (1L to 8L).map(i =>
      i -> (1 to 10).map(j => s"v${i}y$j").mkString(" ")).toMap
    // docs 7 and 8 are exact duplicates → the corpus has a real cluster
    val corpus = docs((texts + (8L -> texts(7L))).toSeq.sortBy(_._1): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_adopt").toString
    val store = new ParquetTableStore(spark, s"$tmp/idx")
    DedupIndexStore.build(store, corpus, n = 3, tJac = 0.4, tCont = 0.4)
    // selfPairs == the one-shot prefix-filter join over the same corpus
    val sp = DedupIndexStore.selfPairs(store)
      .as[(Long, Long, Long)].collect().toSet
    val direct = TextDedup.prefixFilterPairs(corpus, n = 3, minJaccard = 0.4)
      .as[(Long, Long, Long)].collect().toSet
    assert(sp == direct && sp.nonEmpty, s"selfPairs drifted: $sp vs $direct")
    // a serve against the adopted store must NOT throw on the missing
    // clusters table: the batch doc near-dups doc 7 → it lands in the
    // bootstrapped {7,8} cluster (label 7), with no frozen splits yet
    var outs = Map.empty[Long, (Long, String)]
    val n = Curation.splitServe(store, docs(100L -> texts(7L)),
        threshold = 0.4) { df =>
      outs = df.as[(Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    assert(n == 1L)
    val expectSplit = Seq(7L).toDF("doc_id")
      .select(Curation.splitOfLabel($"doc_id")).as[String].head()
    assert(outs == Map(100L -> ((7L, expectSplit))),
      s"adopted-store serve drifted: $outs")
  }
}
