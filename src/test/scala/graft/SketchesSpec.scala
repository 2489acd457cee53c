package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** The engine-portable bottom-k sketches (a23/a24): estimator accuracy,
  * exact shard mergeability, and the exact-below-capacity contract.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sfTiny).cache()

  test("KMV estimate lands within the estimator's error envelope; exact below capacity") {
    val exact = li.select(countDistinct($"l_orderkey")).head().getLong(0)
    val est = Sketches.kmvDistinct(li, $"l_orderkey", k = 1024, salt = "o",
      outName = "est").head().getLong(0)
    // rsd ≈ 1/√(k−2) ≈ 3.1% at k=1024 — gate at 4σ
    assert(math.abs(est - exact).toDouble / exact < 0.125,
      s"KMV est $est vs exact $exact")
    // below capacity the synopsis IS the distinct set — estimate exact
    val flags = li.select(countDistinct($"l_returnflag")).head().getLong(0)
    val fEst = Sketches.kmvDistinct(li, $"l_returnflag", k = 1024, salt = "f",
      outName = "est").head().getLong(0)
    assert(fEst == flags, s"below-capacity KMV must be exact: $fEst vs $flags")
  }

  test("KMV synopsis merges exactly: shard fold == one-shot at any layout") {
    val k = 256
    val one = Sketches.kmvSynopsis(li, $"l_orderkey", k, "m")
      .as[Long].collect().toSeq
    // three shards, folded: union of synopses → distinct → k smallest
    val shards = (0 until 3).map(i =>
      Sketches.kmvSynopsis(li.filter($"l_orderkey" % 3 === i), $"l_orderkey", k, "m"))
    val folded = shards.reduce(_ unionByName _).distinct()
      .orderBy($"h").limit(k).as[Long].collect().toSeq
    assert(folded == one && one.length == k,
      "folded KMV synopsis drifted from the one-shot")
    // and the estimates therefore agree exactly
    val e1 = Sketches.kmvEstimate(shards.reduce(_ unionByName _).distinct()
      .orderBy($"h").limit(k), k, "est").head().getLong(0)
    val e2 = Sketches.kmvEstimate(Sketches.kmvSynopsis(li, $"l_orderkey", k, "m"),
      k, "est").head().getLong(0)
    assert(e1 == e2)
  }

  test("bottom-k sample merges exactly; small groups yield exact quartiles") {
    val key = concat($"l_orderkey".cast("string"), lit("-"),
      $"l_linenumber".cast("string"))
    val k = 128
    def sampleSet(df: org.apache.spark.sql.DataFrame) =
      Sketches.bottomKSample(df, $"l_returnflag", key, $"l_quantity", k, "q")
        .as[(String, Double, Long)].collect().toSet
    val one = sampleSet(li)
    // shard fold: union shard samples, re-rank, keep k per group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"h")
    val folded = (0 until 3).map(i =>
        Sketches.bottomKSample(li.filter($"l_orderkey" % 3 === i),
          $"l_returnflag", key, $"l_quantity", k, "q"))
      .reduce(_ unionByName _)
      .withColumn("srn", row_number().over(w)).filter($"srn" <= k).drop("srn")
      .as[(String, Double, Long)].collect().toSet
    assert(folded == one && one.nonEmpty,
      "folded bottom-k sample drifted from the one-shot")
    // a group smaller than k is sampled whole → quartiles EXACT
    val tiny = li.filter($"l_returnflag" === "R").limit(60)
      .select($"l_returnflag", $"l_quantity", $"l_orderkey", $"l_linenumber")
      .localCheckpoint(true)
    val got = Sketches.bottomKQuantiles(
        Sketches.bottomKSample(tiny, $"l_returnflag", key, $"l_quantity",
          k = 1024, salt = "q"), Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Double, Double)].collect().head
    val vs = tiny.select($"l_quantity").as[Double].collect().sorted
    def exactQ(q: Double) = vs(math.ceil(q * vs.length).toInt - 1)
    assert(got._2 == exactQ(0.25) && got._3 == exactQ(0.5) && got._4 == exactQ(0.75),
      s"whole-group sample must give exact rank-selection quartiles: $got")
  }
}
