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
  * Hash: md5-derived — a string's 16 digest bytes split into two
  * big-endian 64-bit halves (h1, h2); component p of a signature is the
  * Kirsch–Mitzenmacher combination (h1 + p·h2) masked to 63 bits
  * (Kirsch & Mitzenmacher, ESA 2006 — two hashes simulate k independent
  * ones with no loss for sketching). Deterministic across runs AND
  * across engines: DuckDB reproduces h1/h2 from the md5 hex string
  * (`CAST(concat('0x', substr(md5(s),1,16)) AS UBIGINT)`) and the
  * combination in HUGEINT-mod-2^63 arithmetic, so the whole
  * MinHash/SimHash family is hash-green against a SQL oracle instead of
  * rows-only. The 63-bit mask makes signed-long comparison = unsigned
  * (BIGINT-safe on both engines) at the cost of one sketch bit.
  */
object TextHash {
  final val NumHashes = 64

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (bytes 0-7, bytes 8-15) of md5(s), big-endian signed longs — the
    * same two values DuckDB reads from hex chars [1,16] and [17,32].
    */
  def md5Pair(s: String): (Long, Long) = {
    val d = md.get().digest(s.getBytes("UTF-8"))
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    (h1, h2)
  }

  /** md5 bytes 0-7 as one big-endian signed long (SimHash token hash). */
  def md5Long(s: String): Long = {
    val d = md.get().digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Component p: (h1 + p·h2) mod 2^63. Java's wrapping arithmetic keeps
    * the low 64 bits; the mask keeps the low 63 = what DuckDB computes
    * exactly as (h1 + p·h2) % 9223372036854775808 in HUGEINT.
    */
  def component(h1: Long, h2: Long, p: Int): Long =
    (h1 + p * h2) & Long.MaxValue

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

/** Position-level n-token windows of a text column, stride 1,
  * MULTIPLICITY KEPT (unlike `ShingleArray`'s distinct set) →
  * array<string>. Replaces the
  * `transform(sequence(0, size(w)-n), i -> array_join(slice(w, i+1, n)))`
  * formulation, which evaluates an interpreted Catalyst lambda plus a
  * slice allocation per POSITION — this is one eval per document with a
  * tight loop. Same output: split on single spaces keeping empties,
  * windows joined with ' ', docs shorter than n tokens → empty array.
  */
case class SpanArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanArray =
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
          val (h1, h2) = md5Pair(s)
          var p = 0
          while (p < NumHashes) {
            val v = component(h1, h2, p)
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
      val h = md5Long(toks(i))
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
          val (h1, h2) = md5Pair(s)
          var p = 0
          while (p < NumHashes) {
            val v = component(h1, h2, p)
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
  def spanArray(text: Column, n: Int): Column =
    Bridge.column(SpanArray(Bridge.expression(text), n))
  def minhashSig(text: Column, n: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), n))
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
  def bbitMinhashSig(text: Column, n: Int): Column =
    Bridge.column(BBitMinHashSig(Bridge.expression(text), n))
  def bbitAgree(a: Column, b: Column): Column =
    Bridge.column(BBitAgree(Bridge.expression(a), Bridge.expression(b)))
}
