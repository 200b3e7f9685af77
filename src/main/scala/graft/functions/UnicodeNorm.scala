package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.compat
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as native codegen expressions — the missing
  * precondition under every text-dedup key in this library: the SAME
  * visible text can arrive precomposed (`é` = U+00E9) or decomposed
  * (`e` + U+0301), and md5/minhash/simhash keys split on the byte
  * difference, silently double-counting documents that differ only in
  * encoder history. Normalizing to NFC before hashing makes the key a
  * function of the TEXT, not of which OCR pass or keyboard produced it.
  * NFKC additionally folds compatibility forms (fullwidth `Ａ`→`A`,
  * ligature `ﬁ`→`fi`, ²→2) — the aggressive variant retrieval pipelines
  * use for matching, at the cost of not round-tripping the original.
  *
  * Spark has no built-in normalizer; a Scala UDF would fall out of
  * whole-stage codegen on the hottest scan in the pipeline. These are
  * `UnaryExpression`s with `doGenCode` calling a static kernel — same
  * discipline as [[TextHashes]]. The kernel fast-paths already-normal
  * text (`Normalizer.isNormalized`, true for almost all real corpora):
  * the input `UTF8String` is returned UNCHANGED, no re-encode
  * allocation. Engine-portable: DuckDB's `nfc_normalize` replays NFC
  * (the t21 oracle); NFKC has no DuckDB twin and is spec-pinned
  * instead.
  */
object UnicodeNorm {
  import java.text.Normalizer

  def nfcKernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfkcKernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }

  /** Canonical composition (NFC): what to apply before any dedup key. */
  def nfc_normalize(c: Column): Column =
    compat.column(NfcNormalize(compat.expression(c)))

  /** Compatibility composition (NFKC): the matching/retrieval variant. */
  def nfkc_normalize(c: Column): Column =
    compat.column(NfkcNormalize(compat.expression(c)))
}

/** See [[UnicodeNorm.nfc_normalize]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfcKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfcKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** See [[UnicodeNorm.nfkc_normalize]]. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfkc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfkc_normalize expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfkcKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfkcKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}
