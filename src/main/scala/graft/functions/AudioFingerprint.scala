package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `audio_fingerprint(payload)` — the [[graft.ext.AudioFp]] band-energy
  * fingerprint as a SQL/Column function over a binary column: a 64-bit
  * BIGINT for any decodable WAV-family or FLAC payload, NULL otherwise.
  * With `hamming64` (via xor/bit_count) this makes the whole audio
  * near-dup pipeline expressible from `spark.sql`, matching the text
  * (minhash/simhash) and vector surfaces.
  *
  * Codegen emits one static call per row; the per-row cost is the audio
  * decode itself, so there is nothing further to inline.
  */
object AudioFingerprint {

  /** Boxed bridge for generated code: null = undecodable. */
  def compute(bytes: Array[Byte]): java.lang.Long =
    graft.ext.AudioFp.fingerprint(bytes)
      .map(java.lang.Long.valueOf).orNull

  def audio_fingerprint(payload: Column): Column =
    Bridge.column(AudioFingerprintExpr(Bridge.expression(payload)))
}

case class AudioFingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_fingerprint requires binary, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fingerprint"

  override def nullSafeEval(input: Any): Any =
    AudioFingerprint.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${c.isNull}) {
        java.lang.Long r =
          graft.functions.AudioFingerprint.compute(${c.value});
        if (r != null) { ${ev.isNull} = false; ${ev.value} = r.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
