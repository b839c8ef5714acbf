package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Oracle-portable 60-bit SimHash over an ARRAY<STRING> token column.
  *
  * Per-token hash = the first 15 hex nibbles of md5(token) read as a
  * base-16 integer — i.e. exactly `conv(substring(md5(tok),1,15),16,10)`,
  * reproducible in any engine with an md5 function (the DuckDB oracle
  * rebuilds the same value with exact BIGINT nibble arithmetic). Each of
  * the 60 bits votes ±1 across tokens; vote > 0 sets the output bit
  * (ties → 0, same convention both sides).
  *
  * Same single-pass shape as [[SimHash64]] (one loop over tokens, a
  * 60-int vote table) but md5-based, trading murmur3's speed for
  * cross-engine determinism — this is the variant the t2 correctness
  * gate can hash-check end to end. Near-duplicate token multisets still
  * differ by few vote flips → small Hamming distance.
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](60)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = SimHashMd5.hash60(arr.getUTF8String(t))
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val t = ctx.freshName("t")
      val bit = ctx.freshName("bit")
      val h = ctx.freshName("h")
      val obj = SimHashMd5.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int[] $votes = new int[60];
         |for (int $t = 0; $t < $a.numElements(); $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h = $obj.hash60($a.getUTF8String($t));
         |    for (int $bit = 0; $bit < 60; $bit++) {
         |      if ((($h >>> $bit) & 1L) == 1L) $votes[$bit]++; else $votes[$bit]--;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $bit = 0; $bit < 60; $bit++) {
         |  if ($votes[$bit] > 0) ${ev.value} |= (1L << $bit);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(s) as a 60-bit big-endian value:
    * the big-endian long of digest bytes 0..7, shifted right 4 to drop
    * the 16th nibble. Identical to conv(substring(md5(s),1,15),16,10). */
  def hash60(s: UTF8String): Long = {
    val d = mdLocal.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (digest(i) & 0xffL); i += 1 }
    l >>> 4
  }

  def apply(toks: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(toks)))
}
