package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook: registers the engine's native expressions
  * in the session function registry so they're first-class in SQL too:
  *
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *
  * Installed by GraftSession via builder.withExtensions (the public
  * extension point — no private API involved).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes two array arguments")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        // DotProduct reads primitive doubles; coerce any numeric array
        DotProduct(Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType)))
      }))
  }
}
