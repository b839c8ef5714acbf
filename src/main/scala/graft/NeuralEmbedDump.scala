package graft

/** One-off: refit the NeuralEmbed layer-1 weights on sf0.01 and print
  * the quantized NeuralEmbedWeights source block. */
object NeuralEmbedDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("graft-neuraldump", 8)
    val (w1, b1) = graft.operators.NeuralEmbed.fit(spark, "/root/testdata/sf0.01")
    val q = graft.operators.QualityGate.quantize _
    println("WEIGHTS_BEGIN")
    println("  val w1: IndexedSeq[IndexedSeq[Double]] = IndexedSeq(")
    println(w1.map(row => "    IndexedSeq(" +
      row.map(x => q(x).toString).mkString(", ") + ")").mkString(",\n"))
    println("  )")
    println("  val b1: IndexedSeq[Double] = IndexedSeq(")
    println("    " + b1.map(x => q(x).toString).mkString(", "))
    println("  )")
    println("WEIGHTS_END")
    spark.stop()
  }
}
