package graft

import org.apache.spark.sql.functions._

import graft.operators.{SuffixDedup, TextDedup}

/** Suffix-grouping exact-substring dedup (d25) against the fixed-window
  * family it generalizes, on planted corpora and the sf0.001 table.
  */
class SuffixSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfTiny).cache()

  /** d14-style duplicated-window START positions at window length n. */
  private def dupWindowStarts(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val w = split(TextDedup.normalizeText(col("text")), " ")
    val wins = df.select(col("doc_id"), w.as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(w) - $n), i -> array_join(slice(w, i + 1, $n), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("g"))
    val dup = wins.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("g"))
    wins.join(dup, Seq("g"), "left_semi").select(col("doc_id"), col("p"))
  }

  test("match_len >= n positions equal the duplicated n-window starts (planted)") {
    // planted: docs 1/2 share an 8-token run; 3 repeats its own 9-token
    // run twice; 4 is unique filler
    val planted = Seq(
      (1L, "aa bb cc dd ee ff gg hh xx yy zz qq"),
      (2L, "pp aa bb cc dd ee ff gg hh rr ss tt"),
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 kk m1 m2 m3 m4 m5 m6 m7 m8 m9"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")
    ).toDF("doc_id", "text")
    val n = 8
    val spans = SuffixDedup.maxMatchSpans(planted, minLen = n, maxLen = 32)
    val got = spans.select(col("doc_id"), col("p")).as[(Long, Long)].collect().toSet
    val want = dupWindowStarts(planted, n).as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "vacuous planted corpus")
    assert(got == want, s"suffix span starts != window starts: ${got.diff(want)} / ${want.diff(got)}")
    // maximality: doc 3's repeated run is 9 tokens, longer than the window
    val d3 = spans.filter(col("doc_id") === 3L && col("p") === 1L)
      .select(col("match_len")).as[Long].head()
    assert(d3 == 9L, s"maximal length should see the full 9-token repeat, got $d3")
  }

  test("maximal lengths are capped at maxLen and reach it on long repeats") {
    val long = (1 to 40).map(i => s"t$i").mkString(" ")
    val two = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val spans = SuffixDedup.maxMatchSpans(two, minLen = 8, maxLen = 16)
    val m = spans.agg(max(col("match_len"))).as[Long].head()
    assert(m == 16L, s"cap should bound match_len at 16, got $m")
    // position 1 of both docs matches the full cap
    val p1 = spans.filter(col("p") === 1L).select(col("match_len")).as[Long].collect()
    assert(p1.toSeq == Seq(16L, 16L))
  }

  test("sf0.001 corpus: suffix spans superset the n=8 window starts with maximal lengths") {
    val spans = SuffixDedup.maxMatchSpans(docs, minLen = 8, maxLen = 32).cache()
    val got = spans.select(col("doc_id"), col("p")).as[(Long, Long)].collect().toSet
    val want = dupWindowStarts(docs, 8).as[(Long, Long)].collect().toSet
    assert(got == want)
    // every reported length is WITNESSED (the ℓ-window at that position
    // occurs >= 2 times — exact token-aligned recount) and MAXIMAL (the
    // (ℓ+1)-window there does not, unless the span ends at the doc
    // boundary). Recounts run once per distinct length — a handful.
    val w = split(TextDedup.normalizeText(col("text")), " ")
    val toks = docs.select(col("doc_id"), w.as("w")).cache()
    val docLen = toks.select(col("doc_id"), size(col("w")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val rows = spans.filter(col("match_len") < 32)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no sub-cap spans — vacuous")
    val byLen = rows.groupBy(_._3)
    byLen.foreach { case (len, rs) =>
      def dupStarts(n: Long): Set[(Long, Long)] =
        dupWindowStarts(toks.select(col("doc_id"),
          array_join(col("w"), " ").as("text")), n.toInt)
          .as[(Long, Long)].collect().toSet
      val atLen = dupStarts(len)
      val atLen1 = dupStarts(len + 1)
      rs.foreach { case (d, p, l) =>
        assert(atLen((d, p)), s"span ($d, $p) len $l not duplicated")
        if (p + l - 1 < docLen(d))
          assert(!atLen1((d, p)), s"span ($d, $p) len $l not maximal")
      }
    }
    toks.unpersist(); spans.unpersist()
  }

  // ───── SuffixIndexStore (d26): served == batch-restricted recompute ─────

  test("indexed serve equals batch-restricted recompute on sf0.001 (even/odd split)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sufidx").toString
    val store = new graft.etl.ParquetTableStore(spark, dir)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    graft.operators.SuffixIndexStore.build(store, corpus, minLen = 8, maxLen = 32)
    val served = graft.operators.SuffixIndexStore.servedSpans(store, batch)
      .as[(Long, Long, Long)].collect().toSet
    val full = SuffixDedup.maxMatchSpans(docs, minLen = 8, maxLen = 32)
      .filter(col("doc_id") % 2 === 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(full.nonEmpty, "vacuous: no batch spans at sf0.001")
    assert(served == full,
      s"served != recompute: extra ${served.diff(full)} missing ${full.diff(served)}")
  }

  test("planted cross-boundary + batch-internal spans; append == one-shot build; compact inert") {
    // corpus doc 2 shares an 8-run with BATCH doc 11 (cross-boundary);
    // batch doc 13 repeats its own 9-run (batch-internal, corpus blind)
    val corpusA = Seq((2L, "aa bb cc dd ee ff gg hh xx yy zz qq")).toDF("doc_id", "text")
    val corpusB = Seq((4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "pp aa bb cc dd ee ff gg hh rr ss tt"),
      (13L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 kk m1 m2 m3 m4 m5 m6 m7 m8 m9")
    ).toDF("doc_id", "text")
    val oneShot = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sufidx1").toString)
    graft.operators.SuffixIndexStore.build(oneShot,
      corpusA.unionByName(corpusB), minLen = 8, maxLen = 32)
    val appended = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sufidx2").toString)
    graft.operators.SuffixIndexStore.build(appended, corpusA, minLen = 8, maxLen = 32)
    graft.operators.SuffixIndexStore.append(appended, corpusB)
    val a = graft.operators.SuffixIndexStore.servedSpans(oneShot, batch)
      .as[(Long, Long, Long)].collect().toSet
    val b = graft.operators.SuffixIndexStore.servedSpans(appended, batch)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, s"append-after-build diverged: ${a.diff(b)} / ${b.diff(a)}")
    // cross-boundary: batch 11's 8-run against corpus 2 found, maximal
    assert(a.contains((11L, 2L, 8L)), s"cross-boundary span missing from $a")
    // batch-internal: doc 13's 9-run found with the corpus blind to it
    assert(a.contains((13L, 1L, 9L)), s"batch-internal span missing from $a")
    // corpus rows never emitted; every span is a batch doc
    assert(a.forall { case (d, _, _) => d == 11L || d == 13L })
    // equality with the recompute over the union, restricted to batch
    val full = SuffixDedup.maxMatchSpans(
        corpusA.unionByName(corpusB).unionByName(batch), minLen = 8, maxLen = 32)
      .filter(col("doc_id") >= 10L).as[(Long, Long, Long)].collect().toSet
    assert(a == full, s"served != union recompute: ${a.diff(full)} / ${full.diff(a)}")
    // compact: file count shrinks to <= nBuckets, serve unchanged
    graft.operators.SuffixIndexStore.compact(appended)
    val c = graft.operators.SuffixIndexStore.servedSpans(appended, batch)
      .as[(Long, Long, Long)].collect().toSet
    assert(c == a)
    // re-serve guard: after absorbing the batch, serving it AGAIN must
    // exclude its own stored copies (doc_id anti-join) and reproduce the
    // pre-absorb answer — not self-match every position at full length
    graft.operators.SuffixIndexStore.append(appended, batch)
    val reServed = graft.operators.SuffixIndexStore.servedSpans(appended, batch)
      .as[(Long, Long, Long)].collect().toSet
    assert(reServed == a,
      s"re-serve after absorb drifted: extra ${reServed.diff(a)} missing ${a.diff(reServed)}")
  }

  test("refreeze tightens caps from stored keys: table and serve equal a fresh build") {
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val refrozen = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sufrf1").toString)
    graft.operators.SuffixIndexStore.build(refrozen, corpus, minLen = 6, maxLen = 32)
    graft.operators.SuffixIndexStore.refreeze(refrozen, newMinLen = 8, newMaxLen = 16)
    val fresh = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sufrf2").toString)
    graft.operators.SuffixIndexStore.build(fresh, corpus, minLen = 8, maxLen = 16)
    // the strongest form: the derived TABLE equals the fresh build's,
    // not just the serves (a row-set drift that happened to serve the
    // same spans on this batch would still be a latent bug)
    def rows(s: graft.etl.ParquetTableStore) = s.read("suffix")
      .select(col("prefix"), concat_ws(" ", col("key")).as("k"), col("doc_id"))
      .as[(String, String, Long)].collect().toSet
    val (gotRows, wantRows) = (rows(refrozen), rows(fresh))
    assert(gotRows == wantRows && gotRows.nonEmpty,
      s"refrozen table drifted: extra ${gotRows.diff(wantRows).take(3)} " +
        s"missing ${wantRows.diff(gotRows).take(3)}")
    assert(refrozen.read("meta").as[(Int, Int)].head() == ((8, 16)))
    def spans(s: graft.etl.ParquetTableStore) =
      graft.operators.SuffixIndexStore.servedSpans(s, batch)
        .as[(Long, Long, Long)].collect().toSet
    val got = spans(refrozen)
    assert(got == spans(fresh) && got.nonEmpty, "refrozen serve drifted")
    // loosening either cap is a rebuild by definition — reject loudly
    intercept[IllegalArgumentException] {
      graft.operators.SuffixIndexStore.refreeze(refrozen, 8, 32)
    }
    intercept[IllegalArgumentException] {
      graft.operators.SuffixIndexStore.refreeze(refrozen, 6, 16)
    }
  }

  test("suffix retract equals a build without the docs; serve forgets their spans") {
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val gone = corpus.filter(col("doc_id") % 8 === 0).select(col("doc_id"))
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def temp(tag: String) = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory(s"graft-sufret-$tag").toString)
    val store = temp("a")
    graft.operators.SuffixIndexStore.build(store, corpus, minLen = 8, maxLen = 32)
    graft.operators.SuffixIndexStore.retract(store, gone)
    val fresh = temp("f")
    graft.operators.SuffixIndexStore.build(fresh,
      corpus.filter(col("doc_id") % 8 =!= 0), minLen = 8, maxLen = 32)
    def rows(s: graft.etl.ParquetTableStore) = s.read("suffix")
      .select(col("prefix"), concat_ws(" ", col("key")).as("k"), col("doc_id"))
      .as[(String, String, Long)].collect().toSet
    assert(rows(store) == rows(fresh) && rows(store).nonEmpty)
    def spans(s: graft.etl.ParquetTableStore) =
      graft.operators.SuffixIndexStore.servedSpans(s, batch)
        .as[(Long, Long, Long)].collect().toSet
    val got = spans(store)
    assert(got == spans(fresh) && got.nonEmpty, "retracted serve drifted")
  }

  test("merge of shard-built suffix indexes equals a fresh build at the cap intersection") {
    // shards built at DIFFERENT caps fold to the intersection (max of
    // minLens, min of maxLens) — the only caps both stores can prove;
    // each side tightens by the refreeze slicing inside the merge.
    val corpusA = docs.filter(col("doc_id") % 4 === 0)
    val corpusB = docs.filter(col("doc_id") % 4 === 2)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def temp(tag: String) = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory(s"graft-sufmrg-$tag").toString)
    val shardA = temp("a")
    graft.operators.SuffixIndexStore.build(shardA, corpusA, minLen = 6, maxLen = 32)
    val shardB = temp("b")
    graft.operators.SuffixIndexStore.build(shardB, corpusB, minLen = 8, maxLen = 24)
    graft.operators.SuffixIndexStore.merge(shardA, shardB)
    val fresh = temp("f")
    graft.operators.SuffixIndexStore.build(fresh,
      corpusA.unionByName(corpusB), minLen = 8, maxLen = 24)
    def rows(s: graft.etl.ParquetTableStore) = s.read("suffix")
      .select(col("prefix"), concat_ws(" ", col("key")).as("k"), col("doc_id"))
      .as[(String, String, Long)].collect().toSet
    val (gotRows, wantRows) = (rows(shardA), rows(fresh))
    assert(gotRows == wantRows && gotRows.nonEmpty,
      s"merged table drifted: extra ${gotRows.diff(wantRows).take(3)} " +
        s"missing ${wantRows.diff(gotRows).take(3)}")
    assert(shardA.read("meta").as[(Int, Int)].head() == ((8, 24)))
    def spans(s: graft.etl.ParquetTableStore) =
      graft.operators.SuffixIndexStore.servedSpans(s, batch)
        .as[(Long, Long, Long)].collect().toSet
    val got = spans(shardA)
    assert(got == spans(fresh) && got.nonEmpty, "merged serve drifted")
    // disjoint cap ranges cannot merge — rebuild is the only sound path
    val alien = temp("x")
    graft.operators.SuffixIndexStore.build(alien, corpusB, minLen = 25, maxLen = 32)
    val err = intercept[IllegalArgumentException] {
      graft.operators.SuffixIndexStore.merge(shardA, alien)
    }
    assert(err.getMessage.contains("cap intersection empty"))
  }

  test("indexed scrub equals the window scrub restricted to the batch (sf0.001 + planted)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sufscrub").toString
    val store = new graft.etl.ParquetTableStore(spark, dir)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    graft.operators.SuffixIndexStore.build(store, corpus, minLen = 8, maxLen = 32)
    val served = graft.operators.SuffixIndexStore.scrubServed(store, batch)
      .as[(Long, Long, Long, String)].collect().toSet
    val full = TextDedup.scrubDuplicatedSpans(docs, n = 8)
      .filter(col("doc_id") % 2 === 1)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(served == full && served.nonEmpty,
      s"scrub drifted: extra ${served.diff(full)} missing ${full.diff(served)}")
    // some doc actually lost tokens (non-vacuous scrub)
    assert(served.exists { case (_, n, k, _) => k < n })
    // planted long-run check: the maxLen cap must not leave mid-run
    // tokens unscrubbed (a 40-token shared run ≫ maxLen 16)
    val long = (1 to 40).map(i => s"t$i").mkString(" ")
    val st2 = new graft.etl.ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sufscrub2").toString)
    graft.operators.SuffixIndexStore.build(st2,
      Seq((1L, long)).toDF("doc_id", "text"), minLen = 8, maxLen = 16)
    val scrubbed = graft.operators.SuffixIndexStore.scrubServed(st2,
        Seq((11L, long)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, String)].collect().toSeq
    // md5("") — the fully-scrubbed sentinel
    assert(scrubbed == Seq((11L, 40L, 0L, "d41d8cd98f00b204e9800998ecf8427e")),
      s"capped spans left tokens behind: $scrubbed")
  }
}
