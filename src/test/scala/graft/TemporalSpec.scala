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
}
