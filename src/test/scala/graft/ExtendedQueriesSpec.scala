package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

case class Click(user_id: Long, click_id: Long, click_ts: java.sql.Timestamp)
case class Purchase(user_id: Long, purchase_id: Long, purchase_ts: java.sql.Timestamp)

/** Cross-checks for the round-2 operator widening (ExtendedQueries) plus
  * the stream-stream attribution join. Oracle hashes are the driver's job;
  * these assert structural invariants and driver-side recomputations.
  */
class ExtendedQueriesSpec extends SparkTestBase {
  import spark.implicits._

  test("j5 as-of join equals a driver-side naive computation") {
    val got = SparkEntry.registry("j5_asof_join").fn(spark, sfTiny)
      .select($"user_id", $"event_id", $"click_us", $"last_purchase_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))

    val ev = Tables.events(spark, sfTiny)
      .select($"user_id", $"event_id", expr("ts DIV 1000").as("tus"), $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val purchasesByUser = ev.filter(_._4 == "purchase").groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._3).sorted }
    val want = ev.filter(_._4 == "click").map { case (u, id, tus, _) =>
      val last = purchasesByUser.get(u).flatMap { ts =>
        val eligible = ts.takeWhile(_ <= tus)
        eligible.lastOption
      }
      (u, id, tus, last)
    }.sortBy(t => (t._1, t._2))

    assert(got.length == want.length && got.length > 0)
    assert(got.sortBy(t => (t._1, t._2)).toSeq == want.toSeq)
  }

  test("st3 sliding windows: every event lands in exactly width/slide buckets") {
    val total = SparkEntry.registry("st3_sliding_window").fn(spark, sfTiny)
      .agg(sum($"n")).head().getLong(0)
    val nEvents = Tables.events(spark, sfTiny).count()
    assert(total == 2 * nEvents) // 10-min width / 5-min slide = 2 buckets each
  }

  test("u2/u3 set algebra invariants") {
    val o = Tables.orders(spark, sfTiny)
    val fCust = o.filter($"o_orderstatus" === "F").select($"o_custkey")
      .distinct().as[Long].collect().toSet
    val except = SparkEntry.registry("u2_except").fn(spark, sfTiny)
      .as[Long].collect().toSet
    assert(except.intersect(fCust).isEmpty)
    val intersect = SparkEntry.registry("u3_intersect").fn(spark, sfTiny)
      .as[Long].collect().toSet
    assert(intersect.subsetOf(fCust))
    assert(intersect.intersect(except).isEmpty)
  }

  test("a10 cube grand-total row matches the table count") {
    val cube = SparkEntry.registry("a10_cube").fn(spark, sfTiny)
    val grand = cube.filter($"o_orderstatus".isNull && $"o_orderpriority".isNull)
      .select($"n").as[Long].collect()
    assert(grand.length == 1)
    assert(grand.head == Tables.orders(spark, sfTiny).count())
  }

  test("a11 median lies within group min/max and halves the mass") {
    val med = SparkEntry.registry("a11_median").fn(spark, sfTiny)
      .select($"l_returnflag", $"median_qty").as[(String, Double)].collect().toMap
    val li = Tables.lineitem(spark, sfTiny)
    med.foreach { case (flag, m) =>
      val below = li.filter($"l_returnflag" === flag && $"l_quantity" <= m).count()
      val n = li.filter($"l_returnflag" === flag).count()
      assert(below * 2 >= n, s"median of $flag not a majority split")
    }
  }

  test("a13 approx quartiles bracket the exact percentiles") {
    val approx = SparkEntry.registry("a13_approx_percentile").fn(spark, sfTiny)
      .select($"l_returnflag", array($"q25", $"q50", $"q75"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = Tables.lineitem(spark, sfTiny)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("q"))
      .select($"l_returnflag", $"q").as[(String, Seq[Double])].collect().toMap
    approx.foreach { case (flag, qs) =>
      qs.zip(exact(flag)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 2.0, s"$flag: approx $a vs exact $e")
      }
    }
  }

  test("s8 stratified sample: exactly k per stratum, deterministic") {
    val df = SparkEntry.registry("s8_stratified_sample").fn(spark, sfTiny)
    val sizes = df.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val avail = Tables.documents(spark, sfTiny).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    avail.foreach { case (lang, n) =>
      assert(sizes.getOrElse(lang, 0L) == math.min(n, 20L), s"$lang: ${sizes.get(lang)}")
    }
    // deterministic: rerun yields the same doc set
    val again = SparkEntry.registry("s8_stratified_sample").fn(spark, sfTiny)
    assert(df.select($"doc_id").as[Long].collect().toSet ==
      again.select($"doc_id").as[Long].collect().toSet)
  }

  test("w3 lead/lag gaps are non-negative and null exactly at boundaries") {
    val df = SparkEntry.registry("w3_lead_lag").fn(spark, sfTiny)
    assert(df.filter($"gap_prev_us" < 0 || $"gap_next_us" < 0).count() == 0)
    val nUsers = Tables.events(spark, sfTiny).select($"user_id").distinct().count()
    assert(df.filter($"gap_prev_us".isNull).count() == nUsers) // first per user
    assert(df.filter($"gap_next_us".isNull).count() == nUsers) // last per user
  }

  test("f13 json extraction parses every props row") {
    val df = SparkEntry.registry("f13_json_extract").fn(spark, sfTiny)
    val parsed = df.agg(sum($"n_parsed")).head().getLong(0)
    assert(parsed == Tables.events(spark, sfTiny).count())
  }

  test("q5 multiway join: revenue positive, nations within ASIA") {
    val df = SparkEntry.registry("q5_region_revenue").fn(spark, sfTiny)
    // revenue is rendered as an exact decimal string (2^53 rule, NOTES.md)
    val rows = df.select($"n_name", $"revenue".cast("double")).as[(String, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 > 0))
    val asiaNations = Tables.nation(spark, sfTiny)
      .join(Tables.region(spark, sfTiny).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_name").as[String].collect().toSet
    assert(rows.map(_._1).toSet.subsetOf(asiaNations))
  }

  test("left-outer stream-stream join emits null rows after the watermark closes the window") {
    def ts(min: Long) = new java.sql.Timestamp((24 * 60 + min) * 60000L)
    val clicks = Seq(Click(1, 10, ts(0)), Click(2, 12, ts(5)))
    val purchases = Seq(Purchase(1, 100, ts(10))) // user 2 never purchases

    val batch = Streams.attributionJoinOuter(clicks.toDF(), purchases.toDF())
      .select($"click_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(batch == Set((10L, Some(100L)), (12L, None)))

    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[Click]
    val ps = MemoryStream[Purchase]
    val q = Streams.attributionJoinOuter(cs.toDF(), ps.toDF())
      .select($"click_id", $"purchase_id")
      .writeStream.format("memory").queryName("attribution_outer")
      .outputMode("append").start()
    cs.addData(clicks: _*)
    ps.addData(purchases: _*)
    q.processAllAvailable()
    // advance both watermarks far past click+attribution so the engine can
    // prove click 12 is unmatchable and emit its null row
    cs.addData(Click(9, 99, ts(300)))
    ps.addData(Purchase(9, 999, ts(300)))
    q.processAllAvailable()
    q.processAllAvailable()
    val streamed = spark.table("attribution_outer")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    q.stop()
    assert(streamed.contains((10L, Some(100L))))
    assert(streamed.contains((12L, None)), s"null row not emitted: $streamed")
  }

  test("stream-stream attribution join equals its batch twin") {
    // base well past epoch 0 — the initial watermark is 1970-01-01, and
    // rows at-or-before the watermark are dropped as late
    def ts(min: Long) = new java.sql.Timestamp((24 * 60 + min) * 60000L)
    val clicks = Seq(Click(1, 10, ts(0)), Click(1, 11, ts(60)), Click(2, 12, ts(5)))
    val purchases = Seq(
      Purchase(1, 100, ts(10)),  // within 30 min of click 10
      Purchase(1, 101, ts(75)),  // within 30 min of click 11
      Purchase(1, 102, ts(55)),  // attributed to no click (>30 past 0, before 60)
      Purchase(2, 103, ts(40)))  // >30 min after click 12 → no match

    val batch = Streams.attributionJoin(clicks.toDF(), purchases.toDF())
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((10L, 100L), (11L, 101L)))

    implicit val sqlCtx = spark.sqlContext
    val cs = MemoryStream[Click]
    val ps = MemoryStream[Purchase]
    val q = Streams.attributionJoin(cs.toDF(), ps.toDF())
      .select($"click_id", $"purchase_id")
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    // feed in event-time order: dumping the whole timeline through one
    // source first would advance the watermark past the other side's
    // early rows (correct streaming semantics — late data is dropped)
    cs.addData(clicks.filter(_.click_id != 11): _*)
    ps.addData(purchases.filter(_.purchase_id == 100))
    q.processAllAvailable()
    cs.addData(clicks.filter(_.click_id == 11): _*)
    ps.addData(purchases.filter(_.purchase_id != 100): _*)
    q.processAllAvailable()
    val streamed = spark.table("attribution").as[(Long, Long)].collect().toSet
    q.stop()
    assert(streamed == batch)
  }

  test("PageRank: integer power iteration matches a hand-rolled reference on a star") {
    import graft.operators.Graph
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRankMicro(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    // independent reference: the identical integer recurrence over
    // adjacency maps — any divergence in division order or rounding
    // between the DataFrame plan and the math breaks this exactly
    val all = und ++ und.map(_.swap)
    val adj = all.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val out = adj.map { case (k, v) => k -> v.length.toLong }
    var r: Map[Long, Long] = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (u, vs) => vs.foreach { v => inflow(v) += r(u) / out(u) } }
      r = r.keys.map(k => k -> (150000L + (850L * inflow(k)) / 1000L)).toMap
    }
    assert(got == r, s"got $got expected $r")
    assert(got(1L) > got(2L), "the hub must outrank the leaves")
    assert(got(2L) == got(3L) && got(3L) == got(4L), "symmetric leaves tie")
  }

  test("personalized PageRank: exact reference match, seed component holds all mass") {
    import graft.operators.Graph
    // chain 1–2–3–4 plus a disconnected pair 10–11; seed = {1}. (No
    // monotone-decay claim: an undirected path shows parity waves at a
    // fixed iteration count — a degree-1 seed forwards ALL its mass —
    // so the contract is exactness vs an independent reference plus
    // where the mass is allowed to live.)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val all = und ++ und.map(_.swap)
    val edges = all.toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.personalizedPageRankMicro(edges, seeds, iters = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 1L && got(2L)._1 == 0L, "seed flags")
    val ranks = got.view.mapValues(_._2).toMap
    // independent reference: identical integer recurrence
    val adj = all.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val out = adj.map { case (k, v) => k -> v.length.toLong }
    var r: Map[Long, Long] = adj.keys.map(k => k -> (if (k == 1L) 1000000L else 0L)).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (u, vs) => vs.foreach { v => inflow(v) += r(u) / out(u) } }
      r = r.keys.map { k =>
        k -> ((if (k == 1L) 150000L else 0L) + (850L * inflow(k)) / 1000L)
      }.toMap
    }
    assert(ranks == r, s"got $ranks expected $r")
    assert(Seq(1L, 2L, 3L, 4L).forall(ranks(_) > 0L),
      "every node reachable within 5 hops carries mass")
    assert(ranks(10L) == 0L && ranks(11L) == 0L,
      "the disconnected component must hold zero mass")
  }
}
