package graft

import org.apache.spark.sql.functions._

import graft.operators.ScalarQuant

class ScalarQuantSpec extends SparkTestBase {
  import spark.implicits._

  private def embs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("codes stay in [0,255], extremes map to the ends, constant dims to 0") {
    val df = embs(
      1L -> Seq(0f, 10f, 5f),
      2L -> Seq(1f, 10f, -5f),
      3L -> Seq(0.5f, 10f, 0f))
    val ranges = ScalarQuant.trainRanges(df)
    assert(ranges.toSeq == Seq((0d, 1d), (10d, 10d), (-5d, 5d)))
    val got = ScalarQuant.quantize(df, ranges)
      .select($"vec_id", $"codes").as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(0L, 0L, 255L))   // lo → 0; constant dim → 0; hi → 255
    assert(got(2L) == Seq(255L, 0L, 0L))
    assert(got(3L) == Seq(128L, 0L, 128L)) // midpoint rounds to 128 (127.5 + .5)
    assert(got.values.flatten.forall(c => c >= 0L && c <= 255L))
  }

  test("dequantization error is bounded by half a quantization step") {
    val df = Tables.load(spark, sfTiny, "embeddings")
    val ranges = ScalarQuant.trainRanges(df)
    val maxErr = ScalarQuant.quantize(df, ranges)
      .select(aggregate($"err_micro", lit(0L), (a, x) => greatest(a, x)).as("m"))
      .agg(max($"m")).head().getLong(0)
    // half-step bound: (hi-lo)/255/2 per dim, in micro units (+1 for floor)
    val bound = ranges.map { case (lo, hi) => (hi - lo) / 255.0 / 2.0 * 1e6 }.max + 1
    assert(maxErr <= bound.toLong, s"max err $maxErr above half-step bound $bound")
  }

  test("sq8 topk recalls nearly all exact neighbors (1e-3 quant error vs ~0.3 gaps)") {
    import graft.operators.Similarity
    val df = Tables.load(spark, sfTiny, "embeddings")
    val ranges = ScalarQuant.trainRanges(df)
    val q = df.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, df, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val got = ScalarQuant.sq8TopK(q, df, ranges, k = 5, refine = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 recall $recall < 0.9")
  }

  test("encode plan is narrow: no exchange beyond fan's split repair") {
    val df = Tables.load(spark, sfTiny, "embeddings")
    val ranges = ScalarQuant.trainRanges(df)
    val plan = ScalarQuant.quantize(df, ranges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
