package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * GPT-2 byte-level alphabet mapping (Radford et al. 2019, `encoder.py`
 * `bytes_to_unicode`): every UTF-8 BYTE of the input maps to one
 * printable unicode character — the 188 visibly-printable latin-1 bytes
 * map to themselves, the other 68 (controls, space, DEL, soft hyphen …)
 * map to U+0100.. in ascending byte order — so arbitrary text becomes a
 * whitespace-free string over a fixed 256-character alphabet (space →
 * 'Ġ', newline → 'Ċ'). This is the alphabet GPT-2-family `merges.txt` /
 * `vocab.json` artifacts are written in; byte-level BPE trains and
 * applies on the mapped form.
 *
 * One compiled pass per row (the [[UnigramSegment]] reference-object
 * codegen pattern): output length in chars == input length in BYTES.
 */
case class Gpt2Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_gpt2_bytes"

  def map(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(Gpt2Bytes.ByteToChar(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(a: Any): Any =
    map(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gpt2Bytes", this, classOf[Gpt2Bytes].getName)
    defineCodeGen(ctx, ev, a => s"$ref.map($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Gpt2Bytes {
  /** The reference construction: bytes '!'..'~', '¡'..'¬', '®'..'ÿ'
    * keep their own code point; the remaining 68 bytes take 256+n in
    * ascending byte order. All mapped chars are BMP (max U+0143), so a
    * Java char per byte is exact. */
  val ByteToChar: Array[Char] = {
    val self = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (self(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }
}
