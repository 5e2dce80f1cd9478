package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * Spark has no built-in for it, yet it's the mandatory first step of any
  * text-dedup pipeline: composed "é" (U+00E9) and decomposed "e"+U+0301
  * must fingerprint identically or near-dup detection silently misses
  * visually-equal documents.
  *
  * Fast path: pure-ASCII strings (the overwhelming majority in most
  * corpora) are returned as-is without the JDK normalizer — checked on the
  * raw UTF-8 bytes, no decode.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.normalize(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = "graft.functions.NormalizeUnicode"
      s"""${ev.value} = $cls.normalize($a, "$form");"""
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NormalizeUnicode {
  /** Shared with generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s // ASCII is normalization-invariant in every form
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))
  }

  def normalize_unicode(c: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(
      NormalizeUnicode(GraftColumnBridge.expression(c), form))
}
