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
}
