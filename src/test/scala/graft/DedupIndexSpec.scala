package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.ParquetTableStore
import graft.operators.{DedupIndexStore, TextDedup}

/** The persisted prefix/postings index vs the full-recompute incremental
  * joins: final pairs must be EQUAL (the frozen-order recall argument +
  * exact verification), appends must compose, and a crash mid-append must
  * degrade to extra candidates, never wrong output.
  */
class DedupIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfTiny).cache()
  private lazy val even = docs.filter(col("doc_id") % 2 === 0)
  private lazy val odd = docs.filter(col("doc_id") % 2 === 1)

  private def freshStore(): ParquetTableStore =
    new ParquetTableStore(spark,
      Files.createTempDirectory("graft-dedup-idx").toString)

  private def pairsOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id_a"), col("id_b"), df.columns.last match {
      case c => col(c)
    }).as[(Long, Long, Long)].collect().toSet

  test("indexed incremental pairs equal the full-recompute incremental join") {
    val store = freshStore()
    DedupIndexStore.build(store, even, n = 3, tJac = 0.8, tCont = 0.8)
    val indexed = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val full = pairsOf(TextDedup.prefixFilterPairsIncremental(even, odd, 3, 0.8))
    assert(indexed == full,
      s"indexed-only: ${indexed.diff(full)}; full-only: ${full.diff(indexed)}")
    assert(indexed.nonEmpty, "no planted cross-parity pairs — vacuous test")
  }

  test("indexed incremental containment equals the full-recompute incremental join") {
    val store = freshStore()
    DedupIndexStore.build(store, even, n = 3, tJac = 0.8, tCont = 0.8)
    val indexed =
      pairsOf(DedupIndexStore.containmentIncremental(store, odd, 3, 0.8))
    val full =
      pairsOf(TextDedup.containmentPairsIncremental(even, odd, 3, 0.8))
    assert(indexed == full,
      s"indexed-only: ${indexed.diff(full)}; full-only: ${full.diff(indexed)}")
    assert(indexed.nonEmpty, "vacuous")
  }

  test("append-after-build serves the same final pairs as building on the union") {
    // corpus grows even₁ → even₁ ∪ even₂; the appended index keeps the
    // order frozen at even₁'s frequencies while the rebuilt index freezes
    // the union's — candidate sets may differ, FINAL pairs may not.
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val appended = freshStore()
    DedupIndexStore.build(appended, e1, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.append(appended, e2)
    val rebuilt = freshStore()
    DedupIndexStore.build(rebuilt, even, n = 3, tJac = 0.8, tCont = 0.8)
    val viaAppend = pairsOf(DedupIndexStore.pairsIncremental(appended, odd, 3, 0.8))
    val viaRebuild = pairsOf(DedupIndexStore.pairsIncremental(rebuilt, odd, 3, 0.8))
    assert(viaAppend == viaRebuild)
    val contAppend =
      pairsOf(DedupIndexStore.containmentIncremental(appended, odd, 3, 0.8))
    val contRebuild =
      pairsOf(DedupIndexStore.containmentIncremental(rebuilt, odd, 3, 0.8))
    assert(contAppend == contRebuild)
    assert(viaAppend.nonEmpty && contAppend.nonEmpty, "vacuous")
  }

  test("replayed append is a no-op (sets-table guard)") {
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val store = freshStore()
    DedupIndexStore.build(store, e1, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.append(store, e2)
    val before = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val setsBefore = store.read("sets").count()
    DedupIndexStore.append(store, e2)
    assert(store.read("sets").count() == setsBefore)
    assert(pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8)) == before)
  }

  test("compaction rewrites to ~one file per bucket, served output unchanged") {
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val store = freshStore()
    DedupIndexStore.build(store, e1, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.append(store, e2)
    def files(name: String): Int = store.read(name).inputFiles.length
    val before = files("postings")
    val servedBefore = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val contBefore = pairsOf(DedupIndexStore.containmentIncremental(store, odd, 3, 0.8))
    DedupIndexStore.compact(store)
    val after = files("postings")
    assert(after < before, s"compaction did not shrink files: $before -> $after")
    assert(after <= DedupIndexStore.nBuckets, s"still $after files")
    val servedAfter = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val contAfter = pairsOf(DedupIndexStore.containmentIncremental(store, odd, 3, 0.8))
    assert(servedAfter == servedBefore && contAfter == contBefore)
    assert(servedAfter.nonEmpty && contAfter.nonEmpty, "vacuous")
  }

  test("refreeze equals a fresh build over the same corpus; serves unchanged") {
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val grown = freshStore()
    DedupIndexStore.build(grown, e1, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.append(grown, e2) // e2 froze against e1's stale df
    val preJ = pairsOf(DedupIndexStore.pairsIncremental(grown, odd, 3, 0.8))
    DedupIndexStore.refreeze(grown)
    val fresh = freshStore()
    DedupIndexStore.build(fresh, even, n = 3, tJac = 0.8, tCont = 0.8)
    // strongest form: the refrozen derived tables EQUAL the fresh build's
    for (t <- Seq("freq", "prefix_jac", "prefix_cont", "postings")) {
      val a = grown.read(t).collect().map(_.toSeq).toSet
      val b = fresh.read(t).collect().map(_.toSeq).toSet
      assert(a == b, s"$t diverged after refreeze: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    }
    // serves: unchanged vs pre-refreeze (recall holds under ANY common
    // order + exact verification) and equal to the fresh store's
    val postJ = pairsOf(DedupIndexStore.pairsIncremental(grown, odd, 3, 0.8))
    val freshJ = pairsOf(DedupIndexStore.pairsIncremental(fresh, odd, 3, 0.8))
    assert(postJ == preJ && postJ == freshJ && postJ.nonEmpty)
    val postC = pairsOf(DedupIndexStore.containmentIncremental(grown, odd, 3, 0.8))
    val freshC = pairsOf(DedupIndexStore.containmentIncremental(fresh, odd, 3, 0.8))
    assert(postC == freshC && postC.nonEmpty)
  }

  test("retract equals a fresh build over the remaining corpus; unknown ids are a no-op") {
    val gone = even.filter(col("doc_id") % 8 === 0).select(col("doc_id"))
    val store = freshStore()
    DedupIndexStore.build(store, even, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.retract(store, gone)
    val fresh = freshStore()
    DedupIndexStore.build(fresh,
      even.filter(col("doc_id") % 8 =!= 0), n = 3, tJac = 0.8, tCont = 0.8)
    // strongest form: retracted store EQUALS the never-indexed build
    for (t <- Seq("sets", "freq", "prefix_jac", "prefix_cont", "postings")) {
      val a = store.read(t).collect().map(_.toSeq.map {
        case s: Seq[_] => s.toVector; case x => x
      }).toSet
      val b = fresh.read(t).collect().map(_.toSeq.map {
        case s: Seq[_] => s.toVector; case x => x
      }).toSet
      assert(a == b, s"$t diverged after retract: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    }
    val got = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val exp = pairsOf(DedupIndexStore.pairsIncremental(fresh, odd, 3, 0.8))
    assert(got == exp && got.nonEmpty)
    // no retracted endpoint can appear in any served pair
    val goneIds = gone.as[Long].collect().toSet
    assert(got.forall { case (a2, b2, _) => !goneIds(a2) && !goneIds(b2) })
    // retracting ids the index never held changes nothing
    val before = store.read("sets").count()
    DedupIndexStore.retract(store,
      spark.range(900000, 900010).select(col("id").as("doc_id")))
    assert(store.read("sets").count() == before)
    assert(pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8)) == got)
  }

  test("band index retract equals a build without the docs (both faces)") {
    def sig(df: DataFrame) = TextDedup.simhash(df)
      .select(col("doc_id"), col("simhash").as("hash64"))
    val gone = even.filter(col("doc_id") % 8 === 0).select(col("doc_id"))
    val store = freshStore()
    graft.operators.HammingIndexStore.build(store, sig(even), maxHamming = 7)
    graft.operators.HammingIndexStore.retract(store, gone)
    val fresh = freshStore()
    graft.operators.HammingIndexStore.build(fresh,
      sig(even.filter(col("doc_id") % 8 =!= 0)), maxHamming = 7)
    val a = store.read("bands").collect().map(_.toSeq).toSet
    val b = fresh.read("bands").collect().map(_.toSeq).toSet
    assert(a == b, s"bands diverged after retract: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    val got = graft.operators.HammingIndexStore.pairsIncremental(store, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    val exp = graft.operators.HammingIndexStore.pairsIncremental(fresh, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exp && got.nonEmpty)
    // b-bit face shares the table layout, so the same verb applies
    def bsig(df: DataFrame) = graft.operators.Par.fan(df).select(col("doc_id"),
      graft.functions.TextSketches.bbitMinhashSig(col("text"), 3).as("sig"))
    val bb = freshStore()
    graft.operators.HammingIndexStore.buildBbit(bb, bsig(even), minEst = 0.7)
    graft.operators.HammingIndexStore.retract(bb, gone)
    val bbFresh = freshStore()
    graft.operators.HammingIndexStore.buildBbit(bbFresh,
      bsig(even.filter(col("doc_id") % 8 =!= 0)), minEst = 0.7)
    assert(bb.read("bands").collect().map(_.toSeq).toSet ==
      bbFresh.read("bands").collect().map(_.toSeq).toSet)
  }

  test("merge of shard-built indexes equals a fresh build over the union corpus") {
    // the distributed-build path: shards build INDEPENDENTLY (each
    // freezes its own local prefix order), merge re-ranks under the
    // merged frequencies — so unlike append-after-build, the merged
    // store must equal the fresh union build TABLE BY TABLE, not just
    // in its served pairs.
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val shardA = freshStore()
    DedupIndexStore.build(shardA, e1, n = 3, tJac = 0.8, tCont = 0.8)
    val shardB = freshStore()
    DedupIndexStore.build(shardB, e2, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.merge(shardA, shardB)
    val fresh = freshStore()
    DedupIndexStore.build(fresh, even, n = 3, tJac = 0.8, tCont = 0.8)
    for (t <- Seq("sets", "freq", "prefix_jac", "prefix_cont", "postings")) {
      val a = shardA.read(t).collect().map(_.toSeq.map {
        case s: Seq[_] => s.toVector; case x => x
      }).toSet
      val b = fresh.read(t).collect().map(_.toSeq.map {
        case s: Seq[_] => s.toVector; case x => x
      }).toSet
      assert(a == b, s"$t diverged after merge: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    }
    val gotJ = pairsOf(DedupIndexStore.pairsIncremental(shardA, odd, 3, 0.8))
    val expJ = pairsOf(DedupIndexStore.pairsIncremental(fresh, odd, 3, 0.8))
    assert(gotJ == expJ && gotJ.nonEmpty)
    val gotC = pairsOf(DedupIndexStore.containmentIncremental(shardA, odd, 3, 0.8))
    val expC = pairsOf(DedupIndexStore.containmentIncremental(fresh, odd, 3, 0.8))
    assert(gotC == expC && gotC.nonEmpty)
    // overlapping shards: re-merging a shard already contained is a no-op
    val setsBefore = shardA.read("sets").count()
    DedupIndexStore.merge(shardA, shardB)
    assert(shardA.read("sets").count() == setsBefore)
    assert(pairsOf(DedupIndexStore.pairsIncremental(shardA, odd, 3, 0.8)) == gotJ)
    // parameter mismatch is rejected loudly, store untouched
    val alien = freshStore()
    DedupIndexStore.build(alien, e2, n = 3, tJac = 0.9, tCont = 0.9)
    val err = intercept[IllegalArgumentException](DedupIndexStore.merge(shardA, alien))
    assert(err.getMessage.contains("identical index parameters"))
  }

  test("hamming band index merge equals a single build; face mismatch rejected") {
    def sig(df: DataFrame) = TextDedup.simhash(df)
      .select(col("doc_id"), col("simhash").as("hash64"))
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val shardA = freshStore()
    graft.operators.HammingIndexStore.build(shardA, sig(e1), maxHamming = 7)
    val shardB = freshStore()
    graft.operators.HammingIndexStore.build(shardB, sig(e2), maxHamming = 7)
    graft.operators.HammingIndexStore.merge(shardA, shardB)
    val fresh = freshStore()
    graft.operators.HammingIndexStore.build(fresh, sig(even), maxHamming = 7)
    val a = shardA.read("bands").collect().map(_.toSeq).toSet
    val b = fresh.read("bands").collect().map(_.toSeq).toSet
    assert(a == b, s"bands diverged: ${a.diff(b).take(3)} / ${b.diff(a).take(3)}")
    val got = graft.operators.HammingIndexStore.pairsIncremental(shardA, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    val exp = graft.operators.HammingIndexStore.pairsIncremental(fresh, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exp && got.nonEmpty)
    // a b-bit-face store must not fold into a 64-bit-face one
    def bsig(df: DataFrame) = graft.operators.Par.fan(df).select(col("doc_id"),
      graft.functions.TextSketches.bbitMinhashSig(col("text"), 3).as("sig"))
    val alien = freshStore()
    graft.operators.HammingIndexStore.buildBbit(alien, bsig(e2), minEst = 0.7)
    val err = intercept[IllegalArgumentException](
      graft.operators.HammingIndexStore.merge(shardA, alien))
    assert(err.getMessage.contains("identical index faces"))
    // b-bit ↔ b-bit folds row-identically too (the d34 serving shape)
    val bbA = freshStore()
    graft.operators.HammingIndexStore.buildBbit(bbA, bsig(e1), minEst = 0.7)
    graft.operators.HammingIndexStore.merge(bbA, alien) // alien holds e2's bands
    val bbFresh = freshStore()
    graft.operators.HammingIndexStore.buildBbit(bbFresh, bsig(even), minEst = 0.7)
    assert(bbA.read("bands").collect().map(_.toSeq).toSet ==
      bbFresh.read("bands").collect().map(_.toSeq).toSet,
      "merged b-bit bands drifted from the unsharded build")
  }

  test("simhash band index: served pairs == batch simhashPairs restricted to the batch") {
    // the SimHash face of HammingIndexStore (d28): banding is a pure
    // function of the hash, so serve == recompute needs no frozen-order
    // argument — only that the stored bands and the batch bands slice
    // the same 64 bits the same way.
    def sig(df: DataFrame) = TextDedup.simhash(df)
      .select(col("doc_id"), col("simhash").as("hash64"))
    val store = freshStore()
    graft.operators.HammingIndexStore.build(store, sig(even), maxHamming = 7)
    val served = graft.operators.HammingIndexStore.pairsIncremental(store, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    val full = TextDedup.simhashPairs(docs, maxHamming = 7)
      .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(served == full, s"served $served != recompute $full")
    assert(served.nonEmpty, "vacuous")
    // re-serve guard: absorbing the batch must not change its answer
    graft.operators.HammingIndexStore.append(store, sig(odd))
    val reServed = graft.operators.HammingIndexStore.pairsIncremental(store, sig(odd))
      .as[(Long, Long, Int)].collect().toSet
    assert(reServed == served, s"re-serve drifted: $reServed vs $served")
  }

  test("b-bit band index: served pairs == batch bbitMinhashPairs restricted to the batch") {
    // the width-parameterized face (d29): 16 × 32-bit bands over the
    // packed 8-long signature. Same no-frozen-order argument as the
    // 64-bit face — stored and batch rows slice the signature via the
    // one shared TextDedup.bbitBands.
    def sig(df: DataFrame) = graft.operators.Par.fan(df).select(col("doc_id"),
      graft.functions.TextSketches.bbitMinhashSig(col("text"), 3).as("sig"))
    val store = freshStore()
    graft.operators.HammingIndexStore.buildBbit(store, sig(even), minEst = 0.7)
    val served = graft.operators.HammingIndexStore.pairsIncrementalBbit(store, sig(odd))
      .as[(Long, Long, Long)].collect().toSet
    val full = TextDedup.bbitMinhashPairs(docs, n = 3, minEst = 0.7)
      .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(served == full, s"served $served != recompute $full")
    assert(served.nonEmpty, "vacuous")
    // re-serve guard: absorbing the batch must not change its answer
    graft.operators.HammingIndexStore.appendBbit(store, sig(odd))
    val reServed = graft.operators.HammingIndexStore.pairsIncrementalBbit(store, sig(odd))
      .as[(Long, Long, Long)].collect().toSet
    assert(reServed == served, s"re-serve drifted: $reServed vs $served")
  }

  test("crash between appends degrades to duplicate candidates, never wrong pairs") {
    // simulate dying after the candidate-side tables appended but BEFORE
    // `sets` (the commit point): replaying the append must restore a
    // state whose served output equals the clean path's.
    val e1 = even.filter(col("doc_id") % 4 === 0)
    val e2 = even.filter(col("doc_id") % 4 === 2)
    val store = freshStore()
    DedupIndexStore.build(store, e1, n = 3, tJac = 0.8, tCont = 0.8)
    // partial append: candidate tables only — what a crash right before
    // the sets append leaves behind. Bucket-encoded, as the real append
    // writes (a torn job within one table leaves a SUBSET of bucket
    // files — same duplicates-only degradation, still bucket-valid)
    val sh2 = e2.select(col("doc_id"), explode(TextDedup.shingles(col("text"), 3)).as("s"))
    store.appendBucketed("postings", sh2, Seq("s"), DedupIndexStore.nBuckets)
    // replay the full append (guard sees e2 absent from `sets` → re-adds)
    DedupIndexStore.append(store, e2)
    val clean = freshStore()
    DedupIndexStore.build(clean, e1, n = 3, tJac = 0.8, tCont = 0.8)
    DedupIndexStore.append(clean, e2)
    val gotJ = pairsOf(DedupIndexStore.pairsIncremental(store, odd, 3, 0.8))
    val expJ = pairsOf(DedupIndexStore.pairsIncremental(clean, odd, 3, 0.8))
    assert(gotJ == expJ)
    val gotC = pairsOf(DedupIndexStore.containmentIncremental(store, odd, 3, 0.8))
    val expC = pairsOf(DedupIndexStore.containmentIncremental(clean, odd, 3, 0.8))
    assert(gotC == expC)
    assert(gotJ.nonEmpty && gotC.nonEmpty, "vacuous")
  }
}
