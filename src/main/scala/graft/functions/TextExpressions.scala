package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text-sketch expressions. The array/lambda formulations
  * (transform + slice per shingle, explode + 64 aggregate columns per
  * signature) evaluate interpreted Catalyst lambdas per ELEMENT and force
  * a groupBy shuffle per doc; these expressions do one eval per DOCUMENT
  * with a tight Scala loop and make every sketch a narrow projection —
  * at 100 TB the signature pass needs no shuffle at all.
  *
  * Eval-only (CodegenFallback): a single virtual call per row is already
  * off the per-element hot path; the loops inside are plain JVM code.
  *
  * Hash: FNV-1a 64 over UTF-8 bytes — deterministic across runs/executors;
  * sketches are engine-internal (no cross-engine oracle depends on them).
  */
object TextHash {
  final val FnvOffset = -3750763034362895579L // 0xcbf29ce484222325
  final val FnvPrime = 1099511628211L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** MinHash affine permutation coefficients, seeded (odd multipliers). */
  val NumHashes = 64
  val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").filter(_.nonEmpty)
}

/** Distinct word n-gram shingles of a text column → array<string>. */
case class ShingleArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** 64-component MinHash signature over distinct word n-gram shingles →
  * array<long>. One narrow eval per doc — no explode, no shuffle.
  */
case class MinHashSig(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    import TextHash._
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    if (words.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i <= words.length - n) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        val s = sb.toString
        if (seen.add(s)) {
          val base = fnv1a(s.getBytes("UTF-8"))
          var p = 0
          while (p < NumHashes) {
            val v = base * perms(p)._1 + perms(p)._2
            if (v < mins(p)) mins(p) = v
            p += 1
          }
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over the token multiset of normalized text → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    import TextHash._
    val toks = tokenize(input.asInstanceOf[UTF8String].toString)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv1a(toks(i).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** b-bit MinHash (b=8): bottom byte of each of the 64 component hashes,
  * packed 8 per long → array<long> of 8 (64 bytes per doc instead of 512).
  * At 100 TB the signature table shrinks 8×, and the agreement estimate
  * stays unbiased after collision correction:
  * Ĵ = (agree/64 − 1/256) / (1 − 1/256). Li & König, "b-Bit Minwise
  * Hashing" (WWW 2010).
  */
case class BBitMinHashSig(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    import TextHash._
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    if (words.length >= n) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i <= words.length - n) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        val s = sb.toString
        if (seen.add(s)) {
          val base = fnv1a(s.getBytes("UTF-8"))
          var p = 0
          while (p < NumHashes) {
            val v = base * perms(p)._1 + perms(p)._2
            if (v < mins(p)) mins(p) = v
            p += 1
          }
        }
        i += 1
      }
    }
    val packed = new Array[Long](NumHashes / 8)
    var p = 0
    while (p < NumHashes) {
      packed(p / 8) |= (mins(p) & 0xffL) << ((p % 8) * 8)
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(packed)
  }

  override protected def withNewChildInternal(newChild: Expression): BBitMinHashSig =
    copy(child = newChild)
}

/** Count of agreeing BYTES between two packed b-bit signatures. */
case class BBitAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      val xor = x.getLong(i) ^ y.getLong(i)
      var k = 0
      while (k < 8) {
        if (((xor >>> (k * 8)) & 0xffL) == 0L) agree += 1
        k += 1
      }
      i += 1
    }
    agree
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBitAgree =
    copy(left = newLeft, right = newRight)
}

object TextSketches {
  def shingleArray(text: Column, n: Int): Column =
    Bridge.column(ShingleArray(Bridge.expression(text), n))
  def minhashSig(text: Column, n: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), n))
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
  def bbitMinhashSig(text: Column, n: Int): Column =
    Bridge.column(BBitMinHashSig(Bridge.expression(text), n))
  def bbitAgree(a: Column, b: Column): Column =
    Bridge.column(BBitAgree(Bridge.expression(a), Bridge.expression(b)))
}
