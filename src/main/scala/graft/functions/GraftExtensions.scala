package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

/** SparkSessionExtensions hook: registers every native engine expression
  * in the session function registry so the whole surface is first-class in
  * SQL as well as the DataFrame API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding)          -- cosine hot path
  *   SELECT graft_canonical_json(payload)                -- MD5 hash input
  *   SELECT graft_py_json(payload)                       -- SHA-256 input
  *   SELECT graft_parse_money('₽ 1 234,56')              -- F2+F3+F4
  *   SELECT graft_parse_timestamp('16.07.2023')          -- F1 ladder
  *   SELECT graft_normalize_keys(payload)                -- F15
  *   SELECT graft_minhash(text, 3), graft_bbit_minhash(text, 3)
  *   SELECT graft_simhash(text), graft_shingles(text, 3)
  *
  * Installed by GraftSession via builder.withExtensions (the public
  * extension point — no private API involved).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  private def one(fn: String, children: Seq[Expression])(f: Expression => Expression) = {
    require(children.length == 1, s"$fn takes one argument"); f(children.head)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))

    inject("graft_dot") { children =>
      require(children.length == 2, "graft_dot(a, b) takes two array arguments")
      DotProduct(Cast(children.head, ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))
    }
    inject("graft_canonical_json")(one("graft_canonical_json", _)(CanonicalJson))
    inject("graft_py_json")(one("graft_py_json", _)(PyDefaultJson))
    inject("graft_normalize_keys")(one("graft_normalize_keys", _)(NormalizedKeyMap))
    inject("graft_parse_money")(one("graft_parse_money", _)(c =>
      ParseMoney(Cast(c, StringType))))
    inject("graft_parse_timestamp")(one("graft_parse_timestamp", _)(c =>
      ParseTimestamp(Cast(c, StringType))))
    inject("graft_simhash")(one("graft_simhash", _)(SimHash64))
    inject("graft_shingles") { children =>
      require(children.length == 2, "graft_shingles(text, n)")
      ShingleArray(children.head, litInt(children(1), "graft_shingles"))
    }
    inject("graft_minhash") { children =>
      require(children.length == 2, "graft_minhash(text, n)")
      MinHashSig(children.head, litInt(children(1), "graft_minhash"))
    }
    inject("graft_bbit_minhash") { children =>
      require(children.length == 2, "graft_bbit_minhash(text, n)")
      BBitMinHashSig(children.head, litInt(children(1), "graft_bbit_minhash"))
    }
    inject("graft_intersect_size") { children =>
      require(children.length == 2, "graft_intersect_size(a, b)")
      IntersectSize(children.head, children(1))
    }

    // size(array_intersect(a, b)) → intersect_size(a, b): kills the
    // per-candidate-pair intersection-array allocation across the whole
    // dedup/containment verify surface (see SetExpressions).
    ext.injectOptimizerRule(_ => IntersectSizeRewrite)
  }
}
