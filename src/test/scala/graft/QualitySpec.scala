package graft

import org.apache.spark.sql.functions._

import graft.operators.TextQuality

/** Property/exactness gates for the quality + retrieval family
  * (operators/TextQuality): trigram-LM scoring, BM25, deterministic
  * weighted sampling, exact KS drift.
  */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("lm score: exact micro-nats on a minimal corpus") {
    // Single doc "x y z": one trigram, c3 = 1, ctx c2 = 1, V = 3 →
    // nlp = ln((1+3)/(1+1)) = ln 2; round(ln2, 6) = 0.693147.
    val df = Seq((1L, "x y z")).toDF("doc_id", "text")
    val got = TextQuality.lmScore(df).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 693147L)))
  }

  test("lm score: repeated trigrams score lower than unique trigrams") {
    val df = Seq(
      (1L, "a b c a b c a b c a b c"), // one trigram pattern, high counts
      (2L, "p q r s t u v w x y z"),   // every trigram unique
      (3L, "a b")                      // < 3 words → dropped
    ).toDF("doc_id", "text")
    val got = TextQuality.lmScore(df)
      .select($"doc_id", $"n_tris", $"avg_nlp_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == 10L && got(1)._2 == 9L) // n_words - 2
    assert(got(0)._3 < got(1)._3)
  }

  test("lm score: frozen model over its own corpus equals one-shot scoring") {
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 2} end"))
      .toDF("doc_id", "text")
    val oneShot = TextQuality.lmScore(docs)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val frozen = TextQuality.lmScoreWith(TextQuality.lmTrain(docs), docs)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(oneShot == frozen)
  }

  test("lm score: unseen trigrams hit the add-one floor, score higher than seen") {
    val existing = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val model = TextQuality.lmTrain(existing)
    // "a b c" is a seen context+trigram; "x y z" is fully OOV.
    val batch = Seq((10L, "a b c"), (11L, "x y z")).toDF("doc_id", "text")
    val got = TextQuality.lmScoreWith(model, batch)
      .as[(Long, Long, Long)].collect()
      .map { case (k, _, v) => (k, v) }.toMap
    assert(got(10L) < got(11L))
    // OOV exact: nlp = ln((0 + V) / (0 + 1)) = ln 5 ≈ 1.6094379 →
    // DECIMAL(18,6) HALF_UP → 1609438 micro-nats.
    assert(got(11L) == 1609438L)
  }

  test("bm25: tf monotone at equal length, term-free docs excluded") {
    val df = Seq(
      (1L, "spark x x x x x x x"),
      (2L, "spark spark x x x x x x"),
      (3L, "spark spark spark x x x x x"),
      (4L, "y y y y y y y y")).toDF("doc_id", "text")
    val got = TextQuality.bm25(df, Seq("spark"), k = 10)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 2L, 1L)) // more matches rank first; doc 4 absent
  }

  test("bm25: rarer term outscores common term at equal tf") {
    // "rare" appears in 1 doc, "common" in all 4 → idf(rare) > idf(common).
    val df = Seq(
      (1L, "rare common a a"),
      (2L, "common b b b"),
      (3L, "common c c c"),
      (4L, "common d d d")).toDF("doc_id", "text")
    val got = TextQuality.bm25(df, Seq("rare", "common"), k = 10)
      .select($"doc_id", $"n_terms", $"bm25")
      .as[(Long, Long, Double)].collect().sortBy(-_._3)
    assert(got.head._1 == 1L && got.head._2 == 2L) // both terms + rare bonus
  }

  test("weighted sample: deterministic and equal to brute-force keys") {
    val df = (1L to 200L).map(i => (i, 10L + i % 90)).toDF("doc_id", "n_chars")
    val a = TextQuality.weightedSample(df, "doc_id", "n_chars", k = 20)
      .as[(Long, Long, Double)].collect().toSeq
    val b = TextQuality.weightedSample(df, "doc_id", "n_chars", k = 20)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
    // Brute force with java.security MD5 — the same content-derived key.
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 1).toDouble / 4294967297.0
      BigDecimal(-math.log(u) / w.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val brute = (1L to 200L).map(i => (i, 10L + i % 90))
      .map { case (i, w) => (i, w, key(i, w)) }
      .sortBy(t => (t._3, t._1)).take(20)
    assert(a == brute)
  }

  test("CLI quality train/score: stored frozen LM equals the in-memory API") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_quality").toString
    val docsPath = s"$sfTiny/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val existing = docs.filter($"doc_id" % 2 === 0)
    val batch = docs.filter($"doc_id" % 2 === 1)
    existing.write.parquet(s"$tmp/existing"); batch.write.parquet(s"$tmp/batch")
    graft.app.Main.qualityTrain(spark, s"$tmp/existing", s"$tmp/model")
    val n = graft.app.Main.qualityScore(spark, s"$tmp/batch", s"$tmp/model", s"$tmp/out")
    assert(n == batch.count())
    val cli = spark.read.parquet(s"$tmp/out/scores")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val api = TextQuality.lmScoreFrozen(existing, batch)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(cli == api)
    assert(cli.nonEmpty)
    // --gate at the median score keeps exactly the docs at-or-below it
    val gate = cli.map(_._3).sorted.apply(cli.size / 2)
    graft.app.Main.qualityScore(spark, s"$tmp/batch", s"$tmp/model", s"$tmp/gated", Some(gate))
    val keptIds = spark.read.parquet(s"$tmp/gated/kept")
      .select($"doc_id").as[Long].collect().toSet
    val expectIds = cli.filter(_._3 <= gate).map(_._1).toSet
    assert(keptIds == expectIds && keptIds.nonEmpty && keptIds.size < cli.size)
  }

  test("CLI search: stored index equals direct bm25; append equals rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_search").toString
    val docsPath = s"$sfTiny/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val terms = Seq("vector", "hash", "spark")
    // build on the full corpus → indexed == direct
    graft.app.Main.searchBuild(spark, docsPath, s"$tmp/idx")
    val n = graft.app.Main.searchQuery(spark, s"$tmp/idx", s"$tmp/res", terms, 10)
    assert(n == 10)
    val indexed = spark.read.parquet(s"$tmp/res")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val direct = TextQuality.bm25(docs, terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(indexed == direct)
    // build(even) + append(odd) == build(full)
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$tmp/even")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$tmp/odd")
    graft.app.Main.searchBuild(spark, s"$tmp/even", s"$tmp/idx2")
    graft.app.Main.searchAppend(spark, s"$tmp/odd", s"$tmp/idx2")
    val appended = graft.operators.TextIndexStore.search(spark, s"$tmp/idx2", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(appended == direct)
    // compact: append-accumulated bucket files rewrite to ~1/bucket in a
    // fresh-session-safe pass; the query is unchanged
    graft.app.Main.route(spark, List("search", "compact", s"$tmp/idx2"))
    val compacted = graft.operators.TextIndexStore.search(spark, s"$tmp/idx2", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(compacted == direct)

    // --mmr: the diversified page draws from the BM25 pool, leads with
    // its top hit, never repeats a doc, and is deterministic
    graft.app.Main.route(spark, List("search", "query", s"$tmp/idx",
      s"$tmp/mmr", "--terms", terms.mkString(","), "--k", "10", "--mmr", "--page", "4"))
    val page = spark.read.parquet(s"$tmp/mmr").orderBy($"step")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(page.length == 4)
    val pool = indexed.map(_._1).toSet
    assert(page.map(_._2).toSet.subsetOf(pool) && page.map(_._2).distinct.length == 4)
    // step 1 is pure relevance — the BM25 argmax (bm25 desc, doc_id)
    val top1 = indexed.maxBy(r => (r._3, -r._1))._1
    assert(page.head._2 == top1, s"MMR step 1 must be the BM25 top hit")
    val again = { graft.app.Main.searchQuery(spark, s"$tmp/idx", s"$tmp/mmr2",
        terms, 10, Some(4))
      spark.read.parquet(s"$tmp/mmr2").orderBy($"step")
        .as[(Long, Long, Long, Long, Long)].collect() }
    assert(page.toSeq == again.toSeq, "MMR page must be deterministic")
  }

  test("search merge: shard-built BM25 indexes fold to the full build, overlap-safe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_searchmrg").toString
    val docsPath = s"$sfTiny/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val terms = Seq("vector", "hash", "spark")
    // OVERLAPPING shards (both contain doc_id % 4 == 0): the naive
    // stats-sum would double-count those docs' lengths; merge re-derives
    // stats from the merged postings, so merged == full build exactly
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$tmp/evens")
    docs.filter($"doc_id" % 2 === 1 || $"doc_id" % 4 === 0)
      .write.parquet(s"$tmp/oddsplus")
    graft.app.Main.searchBuild(spark, s"$tmp/evens", s"$tmp/idxa")
    graft.app.Main.searchBuild(spark, s"$tmp/oddsplus", s"$tmp/idxb")
    graft.app.Main.route(spark, List("search", "merge", s"$tmp/idxa", s"$tmp/idxb"))
    graft.app.Main.searchBuild(spark, docsPath, s"$tmp/idxfull")
    val mergedStats = spark.read.parquet(s"$tmp/idxa/stats")
      .as[(Long, Long)].head()
    val fullStats = spark.read.parquet(s"$tmp/idxfull/stats")
      .as[(Long, Long)].head()
    assert(mergedStats == fullStats,
      s"stats drifted (overlap double-count?): $mergedStats vs $fullStats")
    val merged = graft.operators.TextIndexStore.search(spark, s"$tmp/idxa", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val full = graft.operators.TextIndexStore.search(spark, s"$tmp/idxfull", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(merged == full && merged.nonEmpty)
  }

  test("count-min sketch: never under, bounded over, shard-merge == unsharded build") {
    import graft.operators.TextStats
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val toks = docs.select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("exact_n"))
    val n = toks.count()
    val sketch = TextStats.cmsBuild(docs)
    val est = TextStats.cmsEstimate(sketch, exact)
      .join(exact, Seq("token"))
      .select($"token", $"exact_n", $"cms_n")
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    // the one-sided guarantee holds for EVERY token, not just heavy ones
    assert(est.forall { case (_, ex, cm) => cm >= ex },
      s"CMS under-counted: ${est.filter(t => t._3 < t._2).take(3).mkString(", ")}")
    // overestimates stay within a generous multiple of the eN bound
    // (deterministic corpus + deterministic hashes => stable check)
    val bound = math.max(8L, (8 * math.E / 1024 * n).toLong)
    val worst = est.map(t => t._3 - t._2).max
    assert(worst <= bound, s"worst overestimate $worst > bound $bound (N=$n)")
    // mergeability: shard sketches fold by counter addition into
    // EXACTLY the unsharded sketch — linearity of counting
    val merged = TextStats.cmsMerge(
        TextStats.cmsBuild(docs.filter($"doc_id" % 2 === 0)),
        TextStats.cmsBuild(docs.filter($"doc_id" % 2 === 1)))
      .as[(Int, Long, Long)].collect().toSet
    val full = sketch.as[(Int, Long, Long)].collect().toSet
    assert(merged == full, "merged shard sketches drifted from the unsharded build")
  }

  test("search retract: forgotten docs leave ranking as a build without them") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_searchret").toString
    val docsPath = s"$sfTiny/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val terms = Seq("vector", "hash", "spark")
    graft.app.Main.searchBuild(spark, docsPath, s"$tmp/idx")
    docs.filter($"doc_id" % 8 === 0).select($"doc_id").write.parquet(s"$tmp/gone")
    graft.app.Main.route(spark,
      List("search", "retract", s"$tmp/idx", s"$tmp/gone"))
    docs.filter($"doc_id" % 8 =!= 0).write.parquet(s"$tmp/rest")
    graft.app.Main.searchBuild(spark, s"$tmp/rest", s"$tmp/idxrest")
    // stats re-derived: idf/avgdl shift exactly as the smaller build's
    assert(spark.read.parquet(s"$tmp/idx/stats").as[(Long, Long)].head() ==
      spark.read.parquet(s"$tmp/idxrest/stats").as[(Long, Long)].head())
    val got = graft.operators.TextIndexStore.search(spark, s"$tmp/idx", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val exp = graft.operators.TextIndexStore.search(spark, s"$tmp/idxrest", terms, 10)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == exp && got.nonEmpty)
    assert(got.forall(_._1 % 8 != 0), "a retracted doc still ranks")
  }

  test("CLI curate: composed pipeline is deterministic, rate-monotone, dedup-respecting") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_curate").toString
    val docsPath = s"$sfTiny/documents.parquet"
    val n1 = graft.app.Main.curate(spark, docsPath, s"$tmp/a", (1000L, 700L, 300L))
    val n2 = graft.app.Main.curate(spark, docsPath, s"$tmp/b", (1000L, 700L, 300L))
    assert(n1 == n2 && n1 > 0)
    val a = spark.read.parquet(s"$tmp/a/kept")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == spark.read.parquet(s"$tmp/b/kept")
      .select($"doc_id").as[Long].collect().toSet)
    // kept ⊆ exact-dedup canonicals
    val canon = graft.operators.TextDedup
      .exactDedup(spark.read.parquet(docsPath))
      .select($"canonical_id").as[Long].collect().toSet
    assert(a.subsetOf(canon))
    // stricter tail rate keeps strictly fewer; keep-all keeps every canonical
    val nStrict = graft.app.Main.curate(spark, docsPath, s"$tmp/c", (1000L, 300L, 100L))
    assert(nStrict < n1)
    // keep-all rates keep every canonical (all sfTiny docs have >= 3 words,
    // so none drop out of LM scoring)
    val nAll = graft.app.Main.curate(spark, docsPath, s"$tmp/d", (1000L, 1000L, 1000L))
    assert(nAll == canon.size)
    // report equals a recount of the kept table
    val rep = spark.read.parquet(s"$tmp/a/report")
      .as[(String, Long, Long)].collect().toSet
    val recount = spark.read.parquet(s"$tmp/a/kept")
      .groupBy($"pred_lang", $"bucket").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(rep == recount)
  }

  test("gopher rules: each rule fires correctly on constructed docs; gate non-constant on corpus") {
    val crafted = Seq(
      // 60 words incl 2 stopwords, mean len ~3 → passes everything
      (1L, (Seq.fill(58)("word") ++ Seq("the", "a")).mkString(" ")),
      (2L, "too short the a"),                           // fails r_words
      (3L, (Seq.fill(60)("word")).mkString(" ")),        // fails r_stop
      (4L, (Seq.fill(58)("xy") ++ Seq("the", "a")).mkString(" ")), // mean len 2.07 → fails r_len
      (5L, (Seq.fill(29)("# #") ++ Seq("the a")).mkString(" ")), // symbol-heavy → fails r_symbol
      (6L, (Seq.fill(58)("42") ++ Seq("the", "a")).mkString(" "))  // digits → fails r_alpha
    ).toDF("doc_id", "text")
    val got = TextQuality.gopherRules(crafted)
      .select($"doc_id", $"r_words", $"r_len", $"r_symbol", $"r_alpha", $"r_stop", $"passes")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(got(2L)._1 == 0L && got(2L)._6 == 0L)
    assert(got(3L)._5 == 0L && got(3L)._6 == 0L)
    assert(got(4L)._2 == 0L && got(4L)._6 == 0L)
    assert(got(5L)._3 == 0L && got(5L)._6 == 0L)
    assert(got(6L)._4 == 0L && got(6L)._6 == 0L)
    // and on the real corpus the gate must split, not rubber-stamp
    val corpus = TextQuality.gopherRules(Tables.documents(spark, sfTiny))
      .groupBy($"passes").count().as[(Long, Long)].collect().toMap
    assert(corpus.keySet == Set(0L, 1L), s"gate is constant: $corpus")
  }

  test("ks drift: identical sources → 0, disjoint supports → 500000") {
    val same = ((1 to 50).map(i => ("a", 10L + i % 5)) ++
      (1 to 50).map(i => ("b", 10L + i % 5)))
      .toDF("source", "n_chars")
    val ksSame = TextQuality.ksDrift(same)
      .as[(String, Long)].collect().toMap
    assert(ksSame("a") == 0L && ksSame("b") == 0L)

    val split = ((1 to 50).map(_ => ("lo", 1L)) ++
      (1 to 50).map(_ => ("hi", 10L))).toDF("source", "n_chars")
    val ksSplit = TextQuality.ksDrift(split)
      .as[(String, Long)].collect().toMap
    // At x=1: F_lo=1 vs F_corpus=0.5; F_hi=0 vs 0.5 → both sup = 1/2.
    assert(ksSplit("lo") == 500000L && ksSplit("hi") == 500000L)
  }

  test("token entropy: hand-computed micro-nats, uniform max, constant zero") {
    import graft.operators.TextStats
    val docs = Seq(
      (1L, "a a b b"),   // uniform over 2 → H = ln 2
      (2L, "a a a"),     // constant → H = 0
      (3L, "a b c d"))   // uniform over 4 → H = ln 4
      .toDF("doc_id", "text")
    val got = TextStats.tokenEntropy(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // ln2 → 0.693147 (rounded once at the per-count ln): 1386294 − 693147
    assert(got(1L) == ((4L, 693147L)), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 0L)), s"got ${got(2L)}")
    // ln4 − 0 (all counts 1, ln 1 = 0)
    assert(got(3L) == ((4L, 1386294L)), s"got ${got(3L)}")
  }

  test("MMR greedy: diversity outranks a redundant higher-relevance pick") {
    import graft.operators.Mmr
    // three equal-relevance candidates; 11 is an exact copy of 10
    // (sim 1.0), 12 is fully diverse. Classic MMR order: 10, 12, 11 —
    // a pure-relevance ranking (tie on cand_id) would emit 10, 11, 12.
    val cands = Seq((1L, 10L, 272727L), (1L, 11L, 272727L), (1L, 12L, 272727L))
      .toDF("query_id", "cand_id", "rel_micro")
    val sims = Seq((10L, 11L, 1000000L)).toDF("id_a", "id_b", "sim_micro")
    val got = Mmr.rerank(cands, sims, k = 5, lambdaMilli = 700L)
      .orderBy($"step")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => r._2 -> r._3).toSeq == Seq(1L -> 10L, 2L -> 12L, 3L -> 11L),
      s"greedy order wrong: ${got.mkString(",")}")
    // step 2 saw 12 as disjoint (maxsim 0) and 11 as the near-copy
    assert(got(1)._5 == 0L && got(2)._5 == 1000000L)
    // pool exhausted after 3 picks — steps 4/5 emit nothing
    assert(got.length == 3)
    // λ=1000 degenerates to pure relevance order
    val pure = Mmr.rerank(cands, sims, k = 3, lambdaMilli = 1000L)
      .orderBy($"step").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(pure.map(_._3).toSeq == Seq(10L, 11L, 12L))
  }
}
