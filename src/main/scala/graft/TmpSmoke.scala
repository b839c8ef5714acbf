package graft
object TmpSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("sb-smoke")
    val out = ScaleBench.run(spark, "/root/testdata/sf0.01",
      targetDocs = 3000, targetVecs = 100000)
    println("SMOKE_RESULT " + out.filter(_._1.startsWith("hardneg"))
      .map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
