package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

import graft.functions._

/** `SparkSessionExtensions` entry point: registers every graft kernel as a
  * SQL function, so the engine's full scalar/aggregate surface is available
  * to `spark.sql(...)` users (and to any SQL-only tooling sitting on top of
  * a thrift/connect server) without touching the Scala API. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Static parameters (band widths, n-gram sizes, k) arrive as SQL literal
  * arguments and are folded into the expression at resolution time, so the
  * registered functions plan exactly like their Scala twins — same codegen,
  * same map-side partial aggregation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "finite_axpb") { args =>
      arity(args, 3, "finite_axpb")
      FiniteAxpbExpression(args(0), args(1), args(2))
    }
    register(ext, "array_dot") { args =>
      arity(args, 2, "array_dot")
      ArrayDotExpression(args(0), args(1))
    }
    register(ext, "kcore_merge") { args =>
      arity(args, 2, "kcore_merge")
      KCoreMergeExpression(args(0), args(1))
    }
    register(ext, "first_zero_band") { args =>
      arity(args, 3, "first_zero_band")
      val r = intArg(args(1), "first_zero_band", "r")
      FirstZeroBandExpression(args(0), r, intArg(args(2), "first_zero_band", "nBands"))
    }
    register(ext, "shingle_hashes") { args =>
      arity(args, 2, "shingle_hashes")
      ShingleHashesExpression(args(0), intArg(args(1), "shingle_hashes", "n"))
    }
    register(ext, "minhash_signature") { args =>
      arity(args, 2, "minhash_signature")
      MinHashSignature(args(0), intArg(args(1), "minhash_signature", "k"))
    }
    register(ext, "simhash64") { args =>
      arity(args, 1, "simhash64")
      SimHash64(args(0))
    }
    register(ext, "nfc_normalize") { args =>
      arity(args, 1, "nfc_normalize")
      NfcNormalize(args(0))
    }
    register(ext, "nfkc_normalize") { args =>
      arity(args, 1, "nfkc_normalize")
      NfkcNormalize(args(0))
    }
    register(ext, "cosine_lsh_bits") { args =>
      arity(args, 2, "cosine_lsh_bits")
      CosineLshBits(args(0), intArg(args(1), "cosine_lsh_bits", "nBits"))
    }
    register(ext, "portable_ngram_hashes") { args =>
      arity(args, 3, "portable_ngram_hashes")
      PortableNgramHashes(args(0), intArg(args(1), "portable_ngram_hashes", "n"),
        boolArg(args(2), "portable_ngram_hashes", "distinct"))
    }
    register(ext, "winnow_min") { args =>
      arity(args, 2, "winnow_min")
      WinnowMin(args(0), intArg(args(1), "winnow_min", "w"))
    }
    register(ext, "h_index") { args =>
      arity(args, 1, "h_index")
      HIndexAgg(args(0))
    }
    register(ext, "label_mode") { args =>
      arity(args, 1, "label_mode")
      LabelModeAgg(args(0))
    }
    register(ext, "top_k_by_score") { args =>
      arity(args, 3, "top_k_by_score")
      TopKByScore(args(0), args(1), intArg(args(2), "top_k_by_score", "k"))
    }
    register(ext, "vector_sum") { args =>
      arity(args, 1, "vector_sum")
      VectorSumAgg(args(0))
    }
    register(ext, "quantize_micros") { args =>
      arity(args, 1, "quantize_micros")
      QuantizeMicrosExpression(args(0))
    }
    register(ext, "gram_matrix") { args =>
      arity(args, 1, "gram_matrix")
      GramMatrixAgg(args(0))
    }
    register(ext, "bloom_words") { args =>
      arity(args, 2, "bloom_words")
      BloomWordsAgg(args(0), intArg(args(1), "bloom_words", "mBits"))
    }
  }
}

object GraftExtensions {

  private def register(ext: SparkSessionExtensions, name: String)
      (builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** Static parameters must be foldable integers — anything else cannot be
    * baked into the expression at resolution time.
    */
  private def intArg(e: Expression, fn: String, param: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      require(v.isValidInt, s"$fn: parameter $param out of int range: $v")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: parameter $param must be a literal integer, got $other")
  }

  private def boolArg(e: Expression, fn: String, param: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter $param must be a literal boolean, got $other")
  }
}
