package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over an ARRAY<STRING> token column.
  *
  * Single pass: each token is hashed to 64 bits (two murmur3_32 runs
  * with different seeds — the same primitive Spark's own HashExpression
  * family builds on), each bit votes ±1, the sign of each vote becomes
  * the output bit. One loop over tokens and a 64-int vote table —
  * versus the composed built-in form (graft.operators.Dedup.simhash64)
  * which re-scans the token array once per bit.
  *
  * Near-duplicate token multisets differ by few tokens → few vote
  * flips → small Hamming distance; pairing/blocking on the hash (or
  * bands of it) gives the SimHash dedup path.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = SimHash64.hash64(s)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
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
      val obj = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $a.numElements(); $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h = $obj.hash64($a.getUTF8String($t));
         |    for (int $bit = 0; $bit < 64; $bit++) {
         |      if ((($h >>> $bit) & 1L) == 1L) $votes[$bit]++; else $votes[$bit]--;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $bit = 0; $bit < 64; $bit++) {
         |  if ($votes[$bit] > 0) ${ev.value} |= (1L << $bit);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** 64-bit token hash from two seeded murmur3_32 passes. */
  def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0x9747b28c)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def apply(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
}
