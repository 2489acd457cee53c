package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobi eigen solves a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (along [1,1]) and 1 (along [1,-1])
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // residual: A v = λ v for both pairs
    for (i <- 0 until 2) {
      val v = vecs(i)
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      assert(math.abs(av(0) - vals(i) * v(0)) < 1e-12)
      assert(math.abs(av(1) - vals(i) * v(1)) < 1e-12)
    }
  }

  test("pca on a dominant direction: components orthonormal, variance ordered, reconstruction tightens") {
    // deterministic synthetic cloud: a strong direction along (3,4,0,...) +
    // weak structured residue in the other coordinates
    val d = 8
    val rows = (0 until 400).map { i =>
      val t = (i % 97) / 97.0 * 10 - 5
      val vec = Array.tabulate(d) { j =>
        val noise = math.sin(i * 0.7 + j * 1.3) * 0.1
        j match {
          case 0 => 3 * t + noise
          case 1 => 4 * t + noise
          case _ => noise
        }
      }
      (i.toLong, vec.toSeq)
    }
    val df = rows.toDF("vec_id", "v")

    val m = Pca.fit(df, "v", k = d)
    // orthonormal basis
    for (i <- m.components.indices; j <- m.components.indices) {
      val dot = m.components(i).lazyZip(m.components(j)).map(_ * _).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"c${i}.c${j} = $dot")
    }
    // eigenvalues descending, non-negative within the stats rounding:
    // the DECIMAL(18,6) element sums round each covariance entry by
    // ≤ 0.5e-6, which can push a true-zero eigenvalue negative by up to
    // ~d·0.5e-6 (Weyl) — the price of the layout-free exact statistics
    m.eigenvalues.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-9))
    assert(m.eigenvalues.forall(_ > -1e-5 * d))
    // pc1 captures the dominant (3,4) direction: > 99% of total variance
    assert(m.eigenvalues(0) / m.trace > 0.99)
    val c1 = m.components(0)
    assert(math.abs(math.abs(c1(0)) / math.abs(c1(1)) - 0.75) < 0.01)

    // full-rank reconstruction is exact (up to float error)
    val proj = Pca.project(df, "v", m)
    val err = proj.select(Pca.reconstruct(proj, m).as("rec"), col("v"))
      .select(expr(
        "aggregate(zip_with(rec, v, (a, b) -> (a - b) * (a - b)), 0d, (s, x) -> s + x)")
        .as("se"))
      .agg(max(col("se"))).head().getDouble(0)
    assert(err < 1e-12, s"full-rank reconstruction error $err")

    // truncation: k=1 already reconstructs better than mean-only, and
    // k=2 strictly improves on k=1 (variance-ordering in action)
    def mse(k: Int): Double = {
      val mk = Pca.fit(df, "v", k)
      val pk = Pca.project(df, "v", mk)
      pk.select(Pca.reconstruct(pk, mk).as("rec"), col("v"))
        .select(expr(
          "aggregate(zip_with(rec, v, (a, b) -> (a - b) * (a - b)), 0d, (s, x) -> s + x)")
          .as("se"))
        .agg(avg(col("se"))).head().getDouble(0)
    }
    val mean0 = m.trace // mean-only MSE = total variance
    val m1 = mse(1); val m2 = mse(2)
    assert(m1 < mean0 * 0.05, s"k=1 mse $m1 vs variance $mean0")
    assert(m2 < m1, s"k=2 mse $m2 not below k=1 $m1")
  }

  test("pca handles zero-variance dimensions: no NaN, constant dim carries no component") {
    // dim 2 is constant → its variance is 0; the fit must stay finite and
    // put ~no weight on it in the leading components
    val rows = (0 until 100).map { i =>
      val t = (i % 19) - 9.0
      (i.toLong, Seq(t, 2 * t + math.cos(i * 1.1) * 0.01, 7.0))
    }
    val df = rows.toDF("vec_id", "v")
    val m = Pca.fit(df, "v", k = 3)
    assert(m.eigenvalues.forall(v => !v.isNaN && v > -1e-9))
    assert(m.components.flatten.forall(x => !x.isNaN))
    assert(math.abs(m.components(0)(2)) < 1e-6,
      s"constant dim got weight ${m.components(0)(2)} in pc1")
    val proj = Pca.project(df, "v", m).select(col("pc1")).as[Double].collect()
    assert(proj.forall(p => !p.isNaN))
  }

  test("pca projection is deterministic across fits (stable sign convention)") {
    val df = Tables.embeddings(spark, sfTiny)
    val a = Pca.fit(df, "embedding", 4)
    val b = Pca.fit(df, "embedding", 4)
    for (i <- 0 until 4)
      assert(a.components(i).sameElements(b.components(i)), s"component $i differs")
  }

  test("distributed fit: shard statistics fold to the one-shot model bit-for-bit; fit is layout-free") {
    val df = Tables.embeddings(spark, sfTiny)
    val one = Pca.fit(df, "embedding", 4)
    // three shards, built independently — the fold must reproduce the
    // one-shot EXACTLY (decimal statistics are order-exact, so merged
    // covariance is bit-identical and the driver Jacobi is deterministic)
    val merged = Pca.fitMerged(
      (0 until 3).map(i => df.filter($"vec_id" % 3 === i)), "embedding", 4)
    assert(merged.mean.sameElements(one.mean))
    assert(merged.eigenvalues.sameElements(one.eigenvalues))
    assert(merged.trace == one.trace)
    for (i <- 0 until 4)
      assert(merged.components(i).sameElements(one.components(i)),
        s"merged component $i differs from one-shot")
    // layout-free: an adversarial repartition fits the identical model
    // (the double-sum fold this replaced depended on partition order)
    val rep = Pca.fit(df.repartition(7), "embedding", 4)
    for (i <- 0 until 4)
      assert(rep.components(i).sameElements(one.components(i)),
        s"repartitioned component $i differs")
    // mismatched dims refused
    val e = intercept[IllegalArgumentException] {
      Pca.stats(df.select($"vec_id", $"embedding"), "embedding").merge(
        Pca.stats(df.select($"vec_id",
          slice($"embedding", 1, 8).as("embedding")), "embedding"))
    }
    assert(e.getMessage.contains("matching dims"))
  }
}
