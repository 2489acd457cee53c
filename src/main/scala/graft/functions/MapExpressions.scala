package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Key-normalized map (k.lower().replace(" ","") — reference
  * src/transform.py:112-114), one eval per row. The
  * map_from_arrays(transform(map_keys(…))) formulation interpreted a
  * lambda per KEY per row — on a wide normalize that lambda dominated the
  * row cost. Collisions after normalization keep the LAST entry, same as
  * the reference's dict comprehension (and spark.sql.mapKeyDedupPolicy=
  * LAST_WIN on the Column formulation).
  */
case class NormalizedKeyMap(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[MapData]
    val n = m.numElements()
    val keys = m.keyArray(); val vals = m.valueArray()
    val out = new java.util.LinkedHashMap[String, AnyRef](n * 2)
    var i = 0
    while (i < n) {
      // Locale.ROOT: locale-independent lowercase, like Python str.lower()
      // (a Turkish default locale would map I→ı and break key matching)
      val k = keys.getUTF8String(i).toString.toLowerCase(java.util.Locale.ROOT).replace(" ", "")
      out.put(k, if (vals.isNullAt(i)) null else vals.getUTF8String(i))
      i += 1
    }
    val ks = new Array[Any](out.size)
    val vs = new Array[Any](out.size)
    val it = out.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      ks(j) = UTF8String.fromString(e.getKey)
      vs(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizedKeyMap =
    copy(child = newChild)
}
