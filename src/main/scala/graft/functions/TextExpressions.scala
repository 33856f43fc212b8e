package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial rolling hash of a string's UTF-8 bytes:
  * h = Σ b_i · B^(n−1−i) in wrapping 64-bit arithmetic, base B = 257.
  *
  * Used as the document fingerprint (content-addressable dedup key,
  * stable across partitioning and engines that share the definition).
  * A native expression with codegen: the hot loop runs over the
  * UnsafeRow's byte array with zero allocation.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fingerprint64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  // interpreted and generated paths share ONE hash definition — a
  // divergence here would give codegen-fallback queries different
  // fingerprints than whole-stage-codegen ones
  override def nullSafeEval(input: Any): Any =
    Fingerprint64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Fingerprint64 {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 257L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c)))
}

/** MurmurHash3's 64-bit finalizer (fmix64): full-avalanche mixing of a
  * long. Composed with [[Fingerprint64]] it gives a well-distributed
  * word hash whose exact value is still reproducible in plain SQL
  * (wrapping multiply = HUGEINT mod 2^64) — unlike xxhash64, which has
  * no cross-engine replica. Used by the SimHash signature path.
  */
case class Mix64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_mix64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = Mix64.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mix64.mix($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Mix64 {
  /** Called from generated code. */
  def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(Mix64(GraftColumnBridge.expression(c)))
}

/** Unicode text normalization for curation pipelines: NFC
  * canonicalization → lowercase (root locale) → whitespace-run
  * collapse to one space → strip a leading/trailing space. The
  * canonical first step before fingerprinting, shingling, or exact
  * dedup — visually-identical strings ("école" vs "école",
  * tabs vs spaces, case) normalize to one byte sequence, so
  * [[Fingerprint64]] over the result is a presentation-invariant key.
  *
  * A native codegen'd expression (static call inside whole-stage
  * codegen, no UDF serialization). The whitespace class is the
  * explicit ASCII `[ \t\n\r\f]` on BOTH engines (Java `\s` and RE2
  * `\s` disagree on vertical tab), and edge stripping removes exactly
  * the one possible leading/trailing space left by the collapse —
  * `String.trim` would also eat stray control characters that SQL
  * `trim` keeps, a silent divergence. Lowercasing is root-locale
  * Unicode LOWERCASE (not casefold — ß stays ß); the oracle
  * equivalence is exact on ASCII corpora. Known divergences from a
  * codepoint-wise SQL `lower` outside ASCII: Java applies the
  * context-sensitive Greek final-sigma rule AND full 1:M special
  * casings (e.g. U+0130 İ → i + combining dot) — documented rather
  * than papered over; normalize non-ASCII corpora with one engine.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_normalize_text"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeText {
  private val ws = java.util.regex.Pattern.compile("[ \\t\\n\\r\\f]+")

  /** Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val collapsed = ws.matcher(nfc.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ")
    val start = if (collapsed.startsWith(" ")) 1 else 0
    val end = if (collapsed.length > start && collapsed.endsWith(" ")) collapsed.length - 1
      else collapsed.length
    UTF8String.fromString(collapsed.substring(start, end))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(NormalizeText(GraftColumnBridge.expression(c)))
}
