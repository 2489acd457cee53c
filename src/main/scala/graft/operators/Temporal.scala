package graft.operators

import org.apache.spark.sql.Dataset

/** Per-entity temporal smoothing — the monitoring transform a pipeline
  * runs over its own quality/volume signals (dq1/dq2 produce the points;
  * EMA turns them into a trend an alarm can threshold without paging on
  * single-batch noise).
  *
  * Scale shape: EMA is inherently sequential IN TIME but independent
  * ACROSS keys, so the implementation is groupByKey + one in-memory walk
  * per entity — ONE shuffle by key, each group sorted locally (the
  * sessionize/fMGWS shape; a key's history fits, the key count is the
  * scale dimension). No unpartitioned window anywhere.
  *
  * Not oracle-checkable: the recurrence's accumulation order is the
  * definition, and SQL window reformulations (pow-weighted sums) compute
  * DIFFERENT float sequences — TemporalSpec asserts the recurrence
  * against a hand-walked reference instead (rows-only in the gate).
  */
object Temporal {

  final case class Point(key: Long, ts: Long, value: Double)
  final case class Smoothed(key: Long, ts: Long, value: Double, ema: Double)

  /** ema_i = α·v_i + (1−α)·ema_{i−1}, seeded with the first value; ties
    * on ts break by value then insertion-independent fields so the walk
    * is deterministic under any partitioning.
    */
  def ema(points: Dataset[Point], alpha: Double): Dataset[Smoothed] = {
    import points.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    points.groupByKey(_.key).flatMapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(p => (p.ts, p.value))
      var e = Double.NaN
      sorted.iterator.map { p =>
        e = if (e.isNaN) p.value else alpha * p.value + (1 - alpha) * e
        Smoothed(k, p.ts, p.value, e)
      }
    }
  }

  final case class Flagged(key: Long, ts: Long, value: Double, ema: Double,
    is_anom: Int)

  /** Anomaly flags from the EMA residual: dev_i = |v_i − ema_{i−1}|,
    * smoothed by its own EMA (β); a point is anomalous when its deviation
    * exceeds k× the smoothed deviation so far. Two doubles of state per
    * key, the same grouped-local-walk shape as `ema` — and the same
    * recursive-CTE replay makes it oracle-checkable: every float op is
    * sequenced identically on both engines.
    */
  def emaAnomaly(points: Dataset[Point], alpha: Double, beta: Double,
      k: Double): Dataset[Flagged] = {
    import points.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 && k > 0)
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val sorted = it.toArray.sortBy(p => (p.ts, p.value))
      var e = Double.NaN
      var ed = Double.NaN
      sorted.iterator.map { p =>
        val anom =
          if (!e.isNaN && !ed.isNaN) {
            val dev = math.abs(p.value - e)
            if (dev > k * ed) 1 else 0
          } else 0
        if (!e.isNaN) {
          val dev = math.abs(p.value - e)
          ed = if (ed.isNaN) dev else beta * dev + (1 - beta) * ed
        }
        e = if (e.isNaN) p.value else alpha * p.value + (1 - alpha) * e
        Flagged(key, p.ts, p.value, e, anom)
      }
    }
  }

  final case class AnomState(ema: Double, emadev: Double, lastTs: Long)

  /** Streaming twin of `emaAnomaly`: flatMapGroupsWithState carries each
    * key's (ema, emadev) across micro-batches — on in-order-per-key
    * delivery the flags are bit-identical to the batch walk over the
    * concatenated input (TemporalSpec proves it). NaN marks unset state
    * (parquet-safe; Option[Double] would be, too, but the walk's NaN
    * sentinel keeps the two implementations line-for-line identical).
    */
  def emaAnomalyStream(points: Dataset[Point], alpha: Double, beta: Double,
      k: Double): Dataset[Flagged] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import points.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1 && k > 0)
    points.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (key: Long, it: Iterator[Point], state: GroupState[AnomState]) => {
        val sorted = it.toArray.sortBy(p => (p.ts, p.value))
        var e = state.getOption.map(_.ema).getOrElse(Double.NaN)
        var ed = state.getOption.map(_.emadev).getOrElse(Double.NaN)
        val out = sorted.map { p =>
          val anom =
            if (!e.isNaN && !ed.isNaN) {
              val dev = math.abs(p.value - e)
              if (dev > k * ed) 1 else 0
            } else 0
          if (!e.isNaN) {
            val dev = math.abs(p.value - e)
            ed = if (ed.isNaN) dev else beta * dev + (1 - beta) * ed
          }
          e = if (e.isNaN) p.value else alpha * p.value + (1 - alpha) * e
          Flagged(key, p.ts, p.value, e, anom)
        }
        if (out.nonEmpty) state.update(AnomState(e, ed, sorted.last.ts))
        out.iterator
      })
  }

  final case class EmaState(ema: Double, lastTs: Long)

  /** Streaming twin of `ema`: flatMapGroupsWithState carries each key's
    * (ema, lastTs) across micro-batches, so the recurrence continues
    * exactly where the previous batch left off — on in-order-per-key
    * delivery the emitted values are bit-identical to the batch walk
    * over the concatenated input (TemporalSpec proves it). State is two
    * numbers per key, the minimal monitoring footprint.
    */
  def emaStream(points: Dataset[Point], alpha: Double): Dataset[Smoothed] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import points.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    points.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (k: Long, it: Iterator[Point], state: GroupState[EmaState]) => {
        val sorted = it.toArray.sortBy(p => (p.ts, p.value))
        var e = state.getOption.map(_.ema).getOrElse(Double.NaN)
        val out = sorted.map { p =>
          e = if (e.isNaN) p.value else alpha * p.value + (1 - alpha) * e
          Smoothed(k, p.ts, p.value, e)
        }
        if (out.nonEmpty) state.update(EmaState(e, sorted.last.ts))
        out.iterator
      })
  }

  // ───── robust (median/MAD) anomaly — the 50%-breakdown alarm ─────

  final case class IdPoint(key: Long, ts: Long, id: Long, value: Double)
  final case class RobustFlag(key: Long, ts: Long, id: Long, v_micro: Long,
    med2_micro: Long, mad4_micro: Long, is_anom: Long)

  /** One point's robust stats against the trailing window buffer (the
    * buffer INCLUDES the point): med2 = lower+upper middle of the sorted
    * values (2× the median, integer-exact for both parities), mad4 =
    * the same rank selection over |2v − med2| (4× the MAD), flag =
    * 2·|2v − med2| > 3·mad4 with ≥ minN history. Identical arithmetic
    * to the w8 SQL/window formulation — the spec pins all three equal.
    */
  private def robustStep(buf: Array[Long], v: Long, minN: Int): (Long, Long, Long) = {
    val s = buf.sorted
    val n = s.length
    val med2 = s((n + 1) / 2 - 1) + s(n / 2)
    val devs = buf.map(x => math.abs(2 * x - med2)).sorted
    val mad4 = devs((n + 1) / 2 - 1) + devs(n / 2)
    val anom = if (n >= minN && 2 * math.abs(2 * v - med2) > 3 * mad4) 1L else 0L
    (med2, mad4, anom)
  }

  private def robustWalk(key: Long, history: Array[Long],
      pts: Array[IdPoint], window: Int, minN: Int): (Array[RobustFlag], Array[Long]) = {
    val buf = scala.collection.mutable.ArrayBuffer.from(history)
    val out = pts.map { p =>
      val v = math.floor(p.value * 1000000d).toLong
      buf += v
      if (buf.length > window) buf.remove(0, buf.length - window)
      val (med2, mad4, anom) = robustStep(buf.toArray, v, minN)
      RobustFlag(key, p.ts, p.id, v, med2, mad4, anom)
    }
    (out, buf.toArray)
  }

  /** Rolling median/MAD anomaly flags over the trailing `window` points
    * per key — the robust alarm whose baseline one wild spike cannot
    * drag (w7's EMA residual has breakdown point 0; median/MAD have
    * 50%). Grouped local walks, ONE shuffle by key; per point the work
    * is O(window log window) on a bounded buffer. Equals the w8
    * window-function formulation value-for-value (TemporalSpec).
    */
  def robustAnomaly(points: Dataset[IdPoint], window: Int = 21,
      minN: Int = 10): Dataset[RobustFlag] = {
    import points.sparkSession.implicits._
    require(window > 0 && minN > 0)
    points.groupByKey(_.key).flatMapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(p => (p.ts, p.value, p.id))
      robustWalk(k, Array.empty, sorted, window, minN)._1.iterator
    }
  }

  final case class RobustState(recent: Array[Long], lastTs: Long)

  /** Streaming twin of `robustAnomaly`: the state per key is the last
    * ≤ window values (a bounded ring — KBs per key at window 21), so on
    * in-order-per-key delivery the emitted flags are identical to the
    * batch walk over the concatenated input (TemporalSpec proves it
    * across micro-batch splits).
    */
  def robustAnomalyStream(points: Dataset[IdPoint], window: Int = 21,
      minN: Int = 10): Dataset[RobustFlag] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import points.sparkSession.implicits._
    require(window > 0 && minN > 0)
    points.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (k: Long, it: Iterator[IdPoint], state: GroupState[RobustState]) => {
        val sorted = it.toArray.sortBy(p => (p.ts, p.value, p.id))
        val history = state.getOption.map(_.recent).getOrElse(Array.empty[Long])
        val (out, recent) = robustWalk(k, history, sorted, window, minN)
        if (out.nonEmpty) state.update(RobustState(recent, sorted.last.ts))
        out.iterator
      })
  }

  final case class CountPoint(key: String, day: Long, n: Long)
  final case class CusumFlag(key: String, day: Long, n: Long,
    s_pos_milli: Long, s_neg_milli: Long, changepoint: Long)

  /** Two-sided CUSUM changepoint detection over per-key daily counts —
    * the mean-SHIFT monitor dq5's median/MAD point-outlier rule can't
    * give (a 20% sustained drop never trips a 3×MAD gate, but its drift
    * accumulates here): with a frozen baseline μ₀ (milli-mean of the
    * first `warmup` days, integer DIV),
    *
    *   S⁺_t = max(0, S⁺_{t−1} + n_t·1000 − μ₀ − μ₀/20)
    *   S⁻_t = max(0, S⁻_{t−1} + μ₀ − n_t·1000 − μ₀/20)
    *
    * and a day is a changepoint while either side exceeds h = μ₀ (one
    * full baseline day of accumulated drift beyond the 5% slack). ALL
    * Long arithmetic — the sequential walk is bit-identical to the
    * recursive-CTE oracle (the w6 doctrine with zero float risk). Keys
    * are bounded (event types), days per key bounded — the grouped
    * local walk never sees data-scale state.
    */
  def cusum(points: Dataset[CountPoint], warmup: Int = 14): Dataset[CusumFlag] = {
    import points.sparkSession.implicits._
    require(warmup > 0)
    points.groupByKey(_.key).flatMapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(_.day)
      val w = math.min(warmup, sorted.length)
      val mu = sorted.take(w).map(_.n).sum * 1000L / w
      val slack = mu / 20L
      var sp = 0L; var sn = 0L
      sorted.iterator.map { p =>
        sp = math.max(0L, sp + p.n * 1000L - mu - slack)
        sn = math.max(0L, sn + mu - p.n * 1000L - slack)
        CusumFlag(k, p.day, p.n, sp, sn, if (sp > mu || sn > mu) 1L else 0L)
      }
    }
  }

  final case class CusumState(mu: Long, sp: Long, sn: Long, buf: Array[Long])

  /** Streaming twin of `cusum`: per-key state is the frozen baseline +
    * the two drift accumulators — three Longs once warm; during warmup
    * it is the ≤`warmup`-element count buffer (the days are replayed
    * through the walk the moment the baseline freezes, so emitted flags
    * equal the batch walk exactly — TemporalSpec proves it across
    * micro-batch splits). In-order-per-key delivery assumed, the same
    * contract as `robustAnomalyStream`. Keys that never accumulate
    * `warmup` days emit nothing (a stream cannot know the input ended;
    * batch falls back to a shorter baseline there).
    */
  def cusumStream(points: Dataset[CountPoint],
      warmup: Int = 14): Dataset[CusumFlag] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import points.sparkSession.implicits._
    require(warmup > 0)
    points.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (k: String, it: Iterator[CountPoint], state: GroupState[CusumState]) => {
        val sorted = it.toArray.sortBy(_.day)
        var st = state.getOption.getOrElse(CusumState(-1L, 0L, 0L, Array.empty))
        val out = scala.collection.mutable.ArrayBuffer.empty[CusumFlag]
        def step(day: Long, n: Long): Unit = {
          val slack = st.mu / 20L
          val sp = math.max(0L, st.sp + n * 1000L - st.mu - slack)
          val sn = math.max(0L, st.sn + st.mu - n * 1000L - slack)
          st = st.copy(sp = sp, sn = sn)
          out += CusumFlag(k, day, n, sp, sn,
            if (sp > st.mu || sn > st.mu) 1L else 0L)
        }
        var bufDays = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { p =>
          if (st.mu >= 0L) step(p.day, p.n)
          else {
            bufDays += (p.day -> p.n)
            // st.buf packs (day, n) pairs — two longs per buffered day
            if (st.buf.length / 2 + bufDays.length == warmup) {
              // baseline freezes — replay every buffered day now. The
              // cross-batch part of the buffer has no stored days; its
              // flags were unemittable then, so the batch twin's first
              // warmup-1 rows are reproduced from (day, n) pairs kept
              // in the per-invocation buffer plus the stored counts —
              // we store (day, n) pairs packed as two longs instead.
              val counts = st.buf.grouped(2).map(a => (a(0), a(1))).toArray ++
                bufDays
              st = st.copy(mu = counts.map(_._2).sum * 1000L / warmup)
              counts.foreach { case (d, n) => step(d, n) }
            }
          }
        }
        if (st.mu < 0L && bufDays.nonEmpty)
          st = st.copy(buf = st.buf ++ bufDays.flatMap { case (d, n) => Seq(d, n) })
        state.update(st)
        out.iterator
      })
  }
}
