package graft

import graft.operators.Temporal
import graft.operators.Temporal.{Point, Smoothed}

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("ema recurrence matches a hand-walked reference, per key, across partitions") {
    val pts = Seq(
      Point(1L, 10L, 4.0), Point(1L, 20L, 8.0), Point(1L, 30L, 2.0),
      Point(2L, 10L, 10.0), Point(2L, 40L, 20.0))
    val got = Temporal.ema(pts.toDS().repartition(5), alpha = 0.5)
      .collect().toSet
    // key 1: 4.0 → 0.5·8+0.5·4=6.0 → 0.5·2+0.5·6=4.0
    // key 2: 10.0 → 0.5·20+0.5·10=15.0
    assert(got == Set(
      Smoothed(1L, 10L, 4.0, 4.0), Smoothed(1L, 20L, 8.0, 6.0),
      Smoothed(1L, 30L, 2.0, 4.0),
      Smoothed(2L, 10L, 10.0, 10.0), Smoothed(2L, 40L, 20.0, 15.0)))
  }

  test("emaAnomaly flags the spike and only the spike (hand-walked)") {
    // alpha=0.5, beta=0.5, k=2: steady 10s then a spike to 100.
    // i=1: e=10            ed=—     anom 0
    // i=2: dev=0  ed=0     e=10     anom 0 (ed was unset)
    // i=3: dev=0  ed=0     e=10     anom 0 (0 > 2·0 false)
    // i=4: dev=90 ed=45    e=55     anom 1 (90 > 2·0)
    // i=5: dev=45 ed=45    e=32.5   anom 0 (45 > 2·45 false)
    val pts = Seq(
      Point(7L, 10L, 10.0), Point(7L, 20L, 10.0), Point(7L, 30L, 10.0),
      Point(7L, 40L, 100.0), Point(7L, 50L, 10.0))
    val got = Temporal.emaAnomaly(pts.toDS().repartition(3),
        alpha = 0.5, beta = 0.5, k = 2.0)
      .collect().sortBy(_.ts).map(f => (f.ts, f.ema, f.is_anom)).toSeq
    assert(got == Seq((10L, 10.0, 0), (20L, 10.0, 0), (30L, 10.0, 0),
      (40L, 55.0, 1), (50L, 32.5, 0)))
  }

  test("ema invariants on real events: bounded by running min/max, alpha=1 is identity") {
    val pts = Tables.events(spark, sfTiny)
      .selectExpr("user_id as key", "ts", "value").as[Point]
    val sm = Temporal.ema(pts, alpha = 0.2).collect()
    // every ema lies within the [min, max] of its key's history so far
    sm.groupBy(_.key).foreach { case (_, rows) =>
      val ordered = rows.sortBy(p => (p.ts, p.value))
      var lo = Double.MaxValue
      var hi = Double.MinValue
      ordered.foreach { p =>
        lo = math.min(lo, p.value); hi = math.max(hi, p.value)
        assert(p.ema >= lo - 1e-9 && p.ema <= hi + 1e-9,
          s"ema ${p.ema} outside [$lo, $hi] at ts ${p.ts}")
      }
    }
    val ident = Temporal.ema(pts, alpha = 1.0).collect()
    assert(ident.forall(p => p.ema == p.value))
  }

  test("robustAnomaly equals the w8 window formulation on real events") {
    val ev = Tables.events(spark, sfTiny)
      .selectExpr("user_id as key", "ts DIV 1000 as ts", "event_id as id", "value")
      .as[Temporal.IdPoint]
    val got = Temporal.robustAnomaly(ev).collect()
      .map(f => (f.key, f.ts, f.id, f.v_micro, f.med2_micro, f.mad4_micro, f.is_anom))
      .toSet
    val w8 = SparkEntry.registry("w8_robust_anomaly").fn(spark, sfTiny)
      .selectExpr("user_id", "ts_us", "event_id", "v_micro", "med2_micro",
        "mad4_micro", "is_anom")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == w8,
      s"walk-only: ${got.diff(w8).take(3)}; window-only: ${w8.diff(got).take(3)}")
    assert(got.exists(_._7 == 1L), "no anomaly flagged — vacuous test")
  }

  test("streaming robust anomaly across micro-batch splits equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // real per-user event series split by TIME into three micro-batches:
    // late windows straddle the splits, so the flags depend on the
    // ring-buffer state carried across batches
    val pts = Tables.events(spark, sfTiny).filter($"user_id" < 20)
      .selectExpr("user_id as key", "ts DIV 1000 as ts", "event_id as id", "value")
      .as[Temporal.IdPoint].collect().sortBy(p => (p.ts, p.value, p.id))
    val (b1, rest) = pts.splitAt(pts.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 3)

    val src = MemoryStream[Temporal.IdPoint]
    val q = Temporal.robustAnomalyStream(src.toDS())
      .writeStream.format("memory").queryName("robust_stream")
      .outputMode("append").start()
    src.addData(b1.toSeq: _*); q.processAllAvailable()
    src.addData(b2.toSeq: _*); q.processAllAvailable()
    src.addData(b3.toSeq: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("robust_stream")
      .as[Temporal.RobustFlag].collect().toSet
    val batch = Temporal.robustAnomaly(pts.toSeq.toDS()).collect().toSet
    assert(streamed == batch,
      s"stream-only: ${streamed.diff(batch).take(3)}; batch-only: ${batch.diff(streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streaming ema continues per-key state across micro-batches, equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(Point(1L, 10L, 4.0), Point(2L, 10L, 10.0))
    val b2 = Seq(Point(1L, 20L, 8.0), Point(1L, 30L, 2.0), Point(2L, 40L, 20.0))

    val src = MemoryStream[Point]
    val q = Temporal.emaStream(src.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_stream")
      .outputMode("append").start()
    src.addData(b1: _*); q.processAllAvailable()
    src.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ema_stream").as[Smoothed].collect().toSet
    val batch = Temporal.ema((b1 ++ b2).toDS(), alpha = 0.5).collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("streaming anomaly flags continue state across micro-batches, equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // spike lands in the SECOND micro-batch — the flag depends on state
    // (ema, emadev) carried over from the first
    val b1 = Seq(Point(7L, 10L, 10.0), Point(7L, 20L, 10.0), Point(7L, 30L, 10.0))
    val b2 = Seq(Point(7L, 40L, 100.0), Point(7L, 50L, 10.0))

    val src = MemoryStream[Point]
    val q = Temporal.emaAnomalyStream(src.toDS(), alpha = 0.5, beta = 0.5, k = 2.0)
      .writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    src.addData(b1: _*); q.processAllAvailable()
    src.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anom_stream")
      .as[Temporal.Flagged].collect().toSet
    val batch = Temporal.emaAnomaly((b1 ++ b2).toDS(),
      alpha = 0.5, beta = 0.5, k = 2.0).collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.count(_.is_anom == 1) == 1, "expected exactly the spike flagged")
  }

  test("CUSUM: sustained 20% drop accumulates to a changepoint, a single spike does not") {
    // μ0 = 100000 milli (14 flat warmup days); slack 5000, threshold 100000.
    // Key "drop": 14×100 then 30×80 — each drop day adds 15000 to S⁻,
    // so the flag fires from day 14+7 onward (a 20% sustained shift a
    // 3×MAD point rule never trips). Key "spike": one day at 150 adds
    // 45000 to S⁺ — under threshold, then decays 5000/day. No flag.
    val drop = (0L until 14L).map(d => Temporal.CountPoint("drop", d, 100L)) ++
      (14L until 44L).map(d => Temporal.CountPoint("drop", d, 80L))
    val spike = (0L until 14L).map(d => Temporal.CountPoint("spike", d, 100L)) ++
      Seq(Temporal.CountPoint("spike", 14L, 150L)) ++
      (15L until 44L).map(d => Temporal.CountPoint("spike", d, 100L))
    val got = Temporal.cusum((drop ++ spike).toDS()).collect()
      .groupBy(_.key).map { case (k, v) => k -> v.sortBy(_.day) }
    val dropFlags = got("drop").filter(_.changepoint == 1L).map(_.day)
    assert(dropFlags.nonEmpty && dropFlags.min == 20L,
      s"drop must flag from day 20 (7 drift days × 15000 > 100000): $dropFlags")
    assert(got("drop").dropWhile(_.day < 20L).forall(_.changepoint == 1L),
      "once the shift persists the alarm must stay up")
    assert(got("spike").forall(_.changepoint == 0L),
      "a single point spike must not trip the drift alarm")
    // S⁺ decays by the slack once the spike passes
    val s14 = got("spike").find(_.day == 14L).get.s_pos_milli
    val s15 = got("spike").find(_.day == 15L).get.s_pos_milli
    assert(s14 == 45000L && s15 == 40000L)
  }

  test("CUSUM stream equals batch when the warmup straddles micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // split at day 9 — INSIDE the 14-day warmup, so the baseline buffer
    // must carry across micro-batches before it freezes and replays
    val all = (0L until 14L).map(d => Temporal.CountPoint("drop", d, 100L)) ++
      (14L until 30L).map(d => Temporal.CountPoint("drop", d, 80L))
    val (b1, b2) = all.splitAt(9)
    val src = MemoryStream[Temporal.CountPoint]
    val q = Temporal.cusumStream(src.toDS())
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    src.addData(b1: _*); q.processAllAvailable()
    src.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cusum_stream")
      .as[Temporal.CusumFlag].collect().toSet
    val batch = Temporal.cusum(all.toDS()).collect().toSet
    assert(streamed == batch, s"stream != batch:\n$streamed\n$batch")
    assert(streamed.count(_.changepoint == 1L) > 0, "drift must flag — vacuous otherwise")
  }
}
