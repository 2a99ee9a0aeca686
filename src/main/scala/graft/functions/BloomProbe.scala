package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GetStructField, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe with CLEAN codegen — a drop-in for Spark's own
  * `BloomFilterMightContain`, whose generated `(Long)$value` cast breaks
  * under Janino when the probed value constant-folds to a NEGATIVE long
  * literal: `(Long)-123L` parses as the class name `java.lang.Long`
  * minus `123L` ("Expression "java.lang.Long" is not an rvalue"), so
  * every constant probe silently falls back to interpreted projection.
  * This version passes the primitive straight to `mightContainLong` —
  * no cast, no ambiguity — and is pinned codegen-clean by
  * CodegenOnlySpec under `spark.sql.codegen.factoryMode=CODEGEN_ONLY`.
  *
  * Semantics match Spark's expression exactly: a null/absent sketch or a
  * null probe value yields null; the sketch expression must be foldable
  * (it is a trained model artifact, evaluated once per plan, not per row).
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  // the sketch must be evaluable WITHOUT a row: a constant, a scalar
  // subquery (the `WITH bf AS (SELECT bloom_filter_agg…)` idiom), or a
  // field of one — the same admission rule as Spark's own expression
  private def constantSketch(e: Expression): Boolean = e match {
    case e if e.foldable => true
    case _: PlanExpression[_] => true
    case GetStructField(_: PlanExpression[_], _, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if constantSketch(left) =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "might_contain requires a constant or scalar-subquery sketch argument")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain requires (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "might_contain"

  @transient private lazy val bloomFilter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (bloomFilter == null) null
    else {
      val v = right.eval(input)
      if (v == null) null else bloomFilter.mightContainLong(v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloomFilter == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloomFilter,
        classOf[BloomFilter].getName)
      val valueEval = right.genCode(ctx)
      ev.copy(code = code"""
        ${valueEval.code}
        boolean ${ev.isNull} = ${valueEval.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${valueEval.value});
        }""")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
