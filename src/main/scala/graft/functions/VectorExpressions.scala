package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `array<float>` / `array<double>` columns.
  *
  * These exist because the built-in route — `aggregate(zip_with(...))`
  * higher-order functions — allocates an intermediate array per row
  * and falls out of whole-stage codegen's tight loop. A BinaryExpression
  * with `doGenCode` compiles to a single fused scalar loop inside the
  * generated stage: no allocation, no virtual calls per element. At
  * 100 TB of 64-dim embeddings that is the difference between a
  * memory-bandwidth-bound scan and a GC-bound one.
  *
  * Arithmetic contract (oracle parity): elements are upcast to double
  * (exact for floats), accumulated sequentially in index order;
  * cosine = dot / (sqrt(|a|²) · sqrt(|b|²)). Callers that compare
  * against other engines should round to ≤6 decimals — the bit
  * pattern beyond that depends on the engine's summation order.
  *
  * Null contract (matches DuckDB's list functions rather than reading
  * garbage through `ArrayData.getDouble` on a null slot): a NULL
  * element anywhere, or a length mismatch between the two vectors,
  * makes the whole result NULL. Parquet-sourced arrays always carry
  * `containsNull=true`, so this is enforced in both the interpreted
  * and generated paths instead of rejected at analysis time.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // May return null on length mismatch / null element even when both
  // input columns are non-nullable.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (isFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def genGetElem(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** `true`-able null test, compiled away for containsNull=false schemas. */
  protected def genElemIsNull(e: Expression, arr: String, i: String): String =
    if (containsNull(e)) s"$arr.isNullAt($i)" else "false"
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), in one generated loop. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = getElem(left, x, i)
      val yi = getElem(right, y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${genElemIsNull(left, a, i)} || ${genElemIsNull(right, b, i)}) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $xi = ${genGetElem(left, a, i)};
         |    double $yi = ${genGetElem(right, b, i)};
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) = Σaᵢbᵢ. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += getElem(left, x, i) * getElem(right, y, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${genElemIsNull(left, a, i)} || ${genElemIsNull(right, b, i)}) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $dot += (${genGetElem(left, a, i)}) * (${genGetElem(right, b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level facade + SQL registration for the vector expressions. */
object GraftFunctions {
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** MinHash signature aggregate over a long hash column. */
  def minhash(baseHash: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(baseHash), numHashes).toAggregateExpression())

  /** Document-frequency-capped posting-list aggregate (see
    * [[CappedPostingsAgg]]): `struct(df, ids)` with exact `df` and a
    * buffer that never grows past `maxDf + 1` elements.
    */
  def cappedPostings(id: Column, maxDf: Int): Column =
    GraftColumnBridge.column(
      CappedPostingsAgg(GraftColumnBridge.expression(id), maxDf).toAggregateExpression())

  /** Register every graft custom function for SQL use. The single
    * source of truth for the list is [[graft.GraftExtensions.functions]] —
    * the same triples a `spark.sql.extensions`-configured session
    * injects, so the two registration paths cannot drift.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (ident, _, builder) =>
      reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }
}
