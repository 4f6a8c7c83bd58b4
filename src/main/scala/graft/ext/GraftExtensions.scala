package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans.{BoundedMinK, BoundedTopK, DotProduct, MinHashSig, SimHashSig}
import graft.plans.{NfcNormalize, StripAccents}

/** SQL surface for graft's native Catalyst expressions, so
  * spark.sql(...) users get the same kernels the DataFrame API uses:
  *
  *   dot_product(xs, ys)            -- codegen'd double dot product
  *   simhash_sig(features[, portable]) -- 64-bit SimHash
  *   minhash_sig(shingles, k)       -- k-permutation MinHash signature
  *   min_k_distinct(x, k)           -- bounded k-smallest-distinct agg
  *   nfc_normalize(s)               -- Unicode NFC composition
  *   strip_accents(s)               -- NFD + drop combining marks
  *
  * Two registration routes:
  *  - config: `spark.sql.extensions=graft.ext.GraftExtensions`
  *    (the standard extension-library pattern — Delta, Iceberg,
  *    Sedona all ship exactly this hook);
  *  - runtime: `GraftExtensions.register(spark)` for sessions that
  *    already exist (Verify/Bench receive a driver-owned session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triples for every exposed function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(xs, ys) - double dot product of two numeric arrays"),
      { args =>
        require(args.length == 2, "dot_product takes 2 arguments")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(features[, portable]) - 64-bit SimHash of a string array"),
      { args =>
        require(args.length == 1 || args.length == 2,
          "simhash_sig takes 1 or 2 arguments")
        val portable = args.length == 2 && (args(1) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"portable flag must be a boolean literal, got $other")
        })
        SimHashSig(args.head, portable)
      }),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation MinHash signature"),
      { args =>
        require(args.length == 2, "minhash_sig takes 2 arguments")
        val k = litInt(args(1), "minhash_sig k")
        MinHashSig(args.head, k, graft.dedup.MinHashLSH.Prime,
          graft.dedup.MinHashLSH.permConsts(k))
      }),
    (FunctionIdentifier("min_k_distinct"),
      info("min_k_distinct", "min_k_distinct(x, k) - k smallest distinct longs of the group, ascending"),
      { args =>
        require(args.length == 2, "min_k_distinct takes 2 arguments")
        BoundedMinK(args.head, litInt(args(1), "min_k_distinct k"))
      }),
    (FunctionIdentifier("bounded_top_k"),
      info("bounded_top_k", "bounded_top_k(x, k) - k largest values of the group, descending (any orderable type)"),
      { args =>
        require(args.length == 2, "bounded_top_k takes 2 arguments")
        BoundedTopK(args.head, litInt(args(1), "bounded_top_k k"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonical composition"),
      { args =>
        require(args.length == 1, "nfc_normalize takes 1 argument")
        graft.plans.NfcNormalize(args.head)
      }),
    (FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(s) - NFD + drop combining marks (utf8proc semantics)"),
      { args =>
        require(args.length == 1, "strip_accents takes 1 argument")
        graft.plans.StripAccents(args.head)
      }),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] (threshold 0.7, prefix<=4, p=0.1)"),
      { args =>
        require(args.length == 2, "jaro_winkler takes 2 arguments")
        new graft.plans.JaroWinkler(args.head, args(1))
      }))

  /** Runtime registration into an existing session (idempotent —
    * re-registering overwrites with identical definitions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.GraftColumnBridge
        .registerFunction(spark, ident, inf, builder)
    }
}
