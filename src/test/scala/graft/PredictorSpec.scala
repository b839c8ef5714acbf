package graft

import graft.ml.Predictor

class PredictorSpec extends SparkSpecBase {

  test("reference-parity fit (200 trees, seed 42) trains and evaluates true RMSE") {
    val r = Predictor.fit(Predictor.trainingPull(spark, sf001), numTrees = 200)
    assert(r.nTrain > 0 && r.nTest > 0)
    assert(r.rmse > 0 && r.rmse.isFinite) // M4: real RMSE, not the reference's mislabeled MSE
  }

  test("model artifact save/load round-trip preserves predictions (S7)") {
    val r = Predictor.fit(Predictor.trainingPull(spark, sf001), numTrees = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/model"
    r.model.write.overwrite().save(dir)
    val back = org.apache.spark.ml.PipelineModel.load(dir)
    val feats = Map("l_quantity" -> 20.0, "l_discount" -> 0.05,
      "l_tax" -> 0.02, "l_linenumber" -> 1.0)
    assert(Predictor.predictOne(back, spark, feats) ===
      Predictor.predictOne(r.model, spark, feats))
  }

  test("single-row inference returns a 2dp-rounded prediction (M5)") {
    val r = Predictor.fit(Predictor.trainingPull(spark, sf001), numTrees = 10)
    val p = Predictor.predictOne(r.model, spark,
      Map("l_quantity" -> 20.0, "l_discount" -> 0.05, "l_tax" -> 0.02, "l_linenumber" -> 1.0))
    assert(p > 0)
    assert((p * 100) === math.rint(p * 100))
  }
}
