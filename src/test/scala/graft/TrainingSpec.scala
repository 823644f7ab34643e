package graft

import graft.llm.Training
import org.apache.spark.sql.functions._

/** The centroid classifier must actually LEARN — the synthetic fixture's
  * lang column is independent of its text (chance accuracy by
  * construction, which the oracle-checked confusion matrix reflects), so
  * learning ability is proven here on a constructed separable corpus —
  * and the token-sparse production path must reproduce the dense
  * reference formulation exactly. */
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

  test("sparse centroid of a class is the exact dense per-dimension mean") {
    val cents = Training.centroids(Training.tokens(separable, "cls"))
    // Dense reference: centroid dim j = mean of f[j] over the class docs,
    // via the O(dims·tokens) feature builder the sparse path replaced.
    val aCent = cents.filter(col("label") === "a")
      .select(col("c")).collect().head.getSeq[Double](0)
    val aMean = Training.features(separable, "cls")
      .filter(col("label") === "a")
      .select(posexplode(col("f")).as(Seq("i", "x")))
      .groupBy("i").agg(graft.api.Exact.davg(col("x")).as("m"))
      .orderBy("i").collect().map(_.getDouble(1))
    assert(aCent.toArray.toSeq === aMean.toSeq)
  }

  test("sparse norms equal dense norms; dot fold equals dense dot") {
    // ‖f‖² from the sorted run-length fold must equal Σ f[j]² from the
    // dense vector (both exact integers), for every document.
    val toks = Training.tokens(separable, "cls")
    val cents = Training.centroids(toks)
    val sparse = Training.classify(toks, cents)
      .select("doc_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Dense reference cosine via the feature vectors and the same argmax.
    val dense = Training.features(separable, "cls")
      .crossJoin(broadcast(cents.agg(
        expr("sort_array(collect_list(struct(label AS clabel, c)))").as("cs"))))
      .withColumn("best", expr(
        """array_sort(
             transform(cs, s -> struct(vec_cosine(f, s.c) AS cosine,
                                       s.clabel AS clabel)),
             (a, b) -> CASE WHEN a.cosine > b.cosine THEN -1
                            WHEN a.cosine < b.cosine THEN 1
                            WHEN a.clabel < b.clabel THEN -1
                            WHEN a.clabel > b.clabel THEN 1
                            ELSE 0 END)[0]"""))
      .select(col("doc_id"), col("best.cosine").as("cosine")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sparse.keySet === dense.keySet)
    // Same winning cosine up to summation-order rounding (the sparse dot
    // folds in token order, the dense one in dimension order — equal
    // real value, low-bit IEEE difference allowed).
    sparse.foreach { case (id, c) =>
      assert(math.abs(c - dense(id)) < 1e-12, s"doc $id: $c vs ${dense(id)}")
    }
  }

  test("inference is shuffle-free: no window, centroids broadcast") {
    val toks = Training.tokens(separable, "cls")
    val plan = Training.classify(toks, Training.centroids(toks))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-doc window found in:\n$plan")
    assert(plan.contains("Broadcast"), s"expected broadcast centroids in:\n$plan")
  }

  test("classification is total and deterministic across reruns") {
    val toks = Training.tokens(separable, "cls")
    val c = Training.centroids(toks)
    val p1 = Training.classify(toks, c).select("doc_id", "predicted")
    val p2 = Training.classify(toks, c).select("doc_id", "predicted")
    assert(p1.count() === 60)
    assert(p1.except(p2).count() === 0 && p2.except(p1).count() === 0)
  }
}
