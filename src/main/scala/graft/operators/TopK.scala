package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Bounded per-partition top-n pre-prune for top-k-per-key rankings.
  *
  * Every ANN search here ends with `row_number over (partition by query
  * order by score desc)` — a sort-shuffle of the WHOLE scored set. Any
  * row in the global top-n of its key is also in the top-n within its own
  * partition, so a narrow per-partition bounded-heap pass first shrinks
  * the window's input from scan-sized to ≤ partitions·n rows per key,
  * making the ranking shuffle output-sized. Exactness-preserving: the
  * heap uses the window's exact ordering (score desc, id asc).
  */
object TopK {

  /** df ⊇ (keyCol, idCol, scoreCol) → those three columns, pruned to the
    * per-partition top-n rows per key. Follow with the global window.
    */
  def perPartitionTopN(df: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // max of this ordering = WORST kept candidate (lowest score; tie:
    // highest id) — what the bounded heap evicts first. Double.compare
    // (not tuple-negation) so NaN ranks ABOVE +Inf, exactly like the
    // window's descending sort.
    val worstFirst: Ordering[(Long, Long, Double)] =
      new Ordering[(Long, Long, Double)] {
        def compare(a: (Long, Long, Double), b: (Long, Long, Double)): Int = {
          val s = java.lang.Double.compare(b._3, a._3)
          if (s != 0) s else java.lang.Long.compare(a._2, b._2)
        }
      }
    df
      .select(col(keyCol).cast(LongType), col(idCol).cast(LongType),
        col(scoreCol).cast(DoubleType))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
        it.foreach { row =>
          val h = heaps.getOrElseUpdate(row._1,
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          if (h.size < n) h.enqueue(row)
          else if (worstFirst.lt(row, h.head)) { h.dequeue(); h.enqueue(row) }
        }
        heaps.valuesIterator.flatMap(_.iterator)
      }
      .toDF(keyCol, idCol, scoreCol)
  }
}
