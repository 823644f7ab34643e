package graft

import graft.llm.Training
import org.apache.spark.sql.functions._

/** The centroid classifier must actually LEARN — the synthetic fixture's
  * lang column is independent of its text (chance accuracy by
  * construction, which the oracle-checked confusion matrix reflects), so
  * learning ability is proven here on a constructed separable corpus. */
class TrainingSpec extends SparkSpec {
  private val s2 = spark
  import s2.implicits._

  /** 3 classes × 20 docs; each doc = shared filler + 3 class-marker
    * words, so classes are separable but far from orthogonal. */
  private def separable = {
    val mk = Map("a" -> "alpha aleph apex", "b" -> "beta bravo basis",
      "g" -> "gamma gulf grade")
    val rows = for {
      (cls, markers) <- mk.toSeq
      k <- 0 until 20
    } yield (mk.keys.toSeq.sorted.indexOf(cls) * 100L + k,
      s"common filler words shared by every class item$k $markers", cls)
    rows.toDF("doc_id", "text", "cls")
  }

  test("learns a separable corpus perfectly (diagonal confusion)") {
    val conf = Training.confusion(separable, "cls").cache()
    assert(conf.filter(col("label") =!= col("predicted")).count() === 0)
    assert(conf.filter(col("label") === col("predicted"))
      .agg(sum("n")).collect().head.getLong(0) === 60L)
    conf.unpersist()
  }

  test("centroid of a class is the exact per-dimension mean") {
    val feats = Training.features(separable, "cls")
    val cents = Training.centroids(feats)
    // Hand-check one class: centroid dim j = mean of f[j] over its docs.
    val aCent = cents.filter(col("label") === "a")
      .select(col("c")).collect().head.getSeq[Double](0)
    val aMean = feats.filter(col("label") === "a")
      .select(posexplode(col("f")).as(Seq("i", "x")))
      .groupBy("i").agg(graft.api.Exact.davg(col("x")).as("m"))
      .orderBy("i").collect().map(_.getDouble(1))
    assert(aCent.toArray.toSeq === aMean.toSeq)
  }

  test("inference is shuffle-free: no window, centroids broadcast") {
    val feats = Training.features(separable, "cls")
    val plan = Training.classify(feats, Training.centroids(feats))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-doc window found in:\n$plan")
    assert(plan.contains("Broadcast"), s"expected broadcast centroids in:\n$plan")
  }

  test("classification is total and deterministic across reruns") {
    val feats = Training.features(separable, "cls")
    val c = Training.centroids(feats)
    val p1 = Training.classify(feats, c).select("doc_id", "predicted")
    val p2 = Training.classify(feats, c).select("doc_id", "predicted")
    assert(p1.count() === 60)
    assert(p1.except(p2).count() === 0 && p2.except(p1).count() === 0)
  }
}
