package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkTestBase {

  test("every registered query runs non-empty at sf0.001") {
    SparkEntry.registry.foreach { case (name, q) =>
      val df = q.fn(spark, sfTiny)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry maps never collide on a key (a collision silently drops a query)") {
    import graft.queries._
    val sizes = Seq(CoreQueries.all, PipelineQueries.all, EndToEndQueries.all,
      ExtendedQueries.all, CurationQueries.all, QualityQueries.all,
      TpchQueries.all).map(_.size)
    assert(SparkEntry.registry.size == sizes.sum,
      s"registry ${SparkEntry.registry.size} != ${sizes.sum} — duplicate query name")
  }

  test("oracle SQL declared only for registered queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q1 pricing summary sums are decimal-exact, rendered as double") {
    import spark.implicits._
    val df = SparkEntry.registry("q1_pricing_summary").fn(spark, sfTiny)
    val row = df.filter($"l_returnflag" === "A" && $"l_linestatus" === "F").head()
    // internal arithmetic is decimal-exact; the gate-facing column is the
    // correctly-rounded double of that decimal (integral quantities → the
    // double must carry no fraction at this scale)
    val qty = row.getAs[Double]("sum_qty")
    assert(qty > 0 && !qty.isInfinite)
    assert(row.getAs[Long]("count_order") > 0)
  }

  test("w1 priority dedup keeps exactly one row per nation") {
    import spark.implicits._
    val df = SparkEntry.registry("w1_priority_dedup").fn(spark, sfTiny)
    val n = df.count()
    assert(n == df.select($"c_nationkey").distinct().count())
  }

  test("s6 last-wins upsert keeps one row per user") {
    import spark.implicits._
    val df = SparkEntry.registry("s6_upsert_lastwins").fn(spark, sfTiny)
    assert(df.count() == df.select($"user_id").distinct().count())
  }

  test("s5 insert-if-absent never duplicates a key") {
    import spark.implicits._
    val df = SparkEntry.registry("s5_insert_if_absent").fn(spark, sfTiny)
    assert(df.groupBy($"event_id").count().filter($"count" > 1).count() == 0)
  }

  test("j1 anti join result is disjoint from the semi join complement") {
    import spark.implicits._
    val anti = SparkEntry.registry("j1_anti_join").fn(spark, sfTiny)
    val orders = Tables.orders(spark, sfTiny)
      .filter($"o_orderdate" >= lit("1998-06-01").cast("timestamp"))
    val joined = anti.join(orders, anti("c_custkey") === orders("o_custkey"))
    assert(joined.count() == 0)
  }
}
