package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Uses the noop sink so the
  * full plan (all columns, all rows) executes — `.count()` would let
  * Catalyst prune most of the work and flatter the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional args: bench only the named queries (dev iteration); the
    // driver passes none → full run.
    val only = args.toSet
    val spark = GraftSession.get()

    // Warmup (not timed): run every query once at the smallest SF so the
    // timed pass measures execution, not JIT + codegen compilation — the
    // generated code is cached per expression tree and reused at the
    // benchmark SF.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .sortBy(_._1).map { case (name, fn) =>
      // min of two timed runs: single-run numbers on a shared box swing
      // ±2× on the heavy queries (GC, page cache); the min is the real
      // execution cost. A FAILED run must not contribute a (typically
      // fast) elapsed time — report NaN and skip the second run.
      var failed = false
      val times = (1 to 2).flatMap { _ =>
        if (failed) None
        else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed = true
            None
          }
        }
      }
      name -> (if (times.isEmpty) Double.NaN else times.min)
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v.isNaN) "null" else f"$v%.3f")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filterNot(_.isNaN).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also persist to a file: the driver captures a bounded stdout tail,
    // which truncated the round-3 artifact. The file is the durable copy.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
