package graft

import org.apache.spark.sql.functions._
import graft.ml.{AutoMl, IsolationForest, UnifiedApi}

class AutoMlSpec extends SparkSpecBase {
  import spark.implicits._

  private def blob(cx: Double, cy: Double, n: Int, label: Double, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Seq((cx + rnd.nextGaussian() * 0.2).toFloat,
      (cy + rnd.nextGaussian() * 0.2).toFloat), label))
  }

  private lazy val blobs =
    (blob(0, 0, 60, 0.0, 11) ++ blob(4, 4, 60, 1.0, 12)).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }
      .toDF("id", "features", "label")

  test("autoTrain picks a winning classifier and reports a leaderboard") {
    val r = AutoMl.autoTrain(blobs, "features", "label", "classification",
      Seq("logistic_regression", "decision_tree"))
    assert(r.bestMetric >= 0.9)
    assert(r.leaderboard.size == 2 && r.leaderboard.head._2 >= r.leaderboard.last._2)
  }

  test("gridSearch finds the better regularization") {
    val (bestParams, bestMetric) = AutoMl.gridSearch(blobs, "logistic_regression",
      "features", "label", Map("regularization" -> Seq("0.0", "10.0")), "accuracy")
    assert(bestParams("regularization") == "0.0" && bestMetric >= 0.9)
  }

  test("crossValidate returns stable accuracy on separable data") {
    val (mean, sd) = AutoMl.crossValidate(blobs, "decision_tree", "features", "label",
      folds = 3, metricName = "accuracy")
    assert(mean > 0.85 && sd < 0.2)
  }

  test("featureImportance from tree models; unsupported model errors") {
    val withNoise = blobs.withColumn("features",
      concat(col("features"), array(lit(0.5f)))) // constant third feature
    val tm = UnifiedApi.train("random_forest", withNoise, "features", Some("label"))
    val imp = AutoMl.featureImportance(tm.modelId)
    assert(imp.length == 3 && imp(2) < 0.05 && math.abs(imp.sum - 1.0) < 1e-6)
    val lr = UnifiedApi.train("logistic_regression", blobs, "features", Some("label"))
    intercept[IllegalArgumentException](AutoMl.featureImportance(lr.modelId))
  }

  test("isolation forest scores an outlier above inliers") {
    val pts = (blob(0, 0, 200, 0.0, 13).map(_._1) :+ Seq(25f, 25f)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val forest = IsolationForest.fit(pts, "vec", numTrees = 50, sampleSize = 64)
    val scores = IsolationForest.score(pts, "vec", forest)
      .select("id", "anomaly_score").as[(Long, Double)].collect().toMap
    val outlier = scores(200L)
    val inlierMax = scores.filter(_._1 != 200L).values.max
    assert(outlier > inlierMax, s"outlier $outlier vs inlier max $inlierMax")
    assert(outlier > 0.6)
  }

  test("isolation forest: tiny inputs are defined or rejected, never NaN") {
    val two = Seq(Seq(0f, 0f), Seq(1f, 1f)).toDF("vec")
    val f2 = IsolationForest.fit(two, "vec", numTrees = 10, sampleSize = 4)
    val s2 = IsolationForest.score(two, "vec", f2)
      .select("anomaly_score").collect().map(_.getDouble(0))
    assert(s2.forall(s => !s.isNaN && s > 0.0 && s < 1.0))
    intercept[IllegalArgumentException](
      IsolationForest.fit(Seq(Seq(1f)).toDF("vec"), "vec"))
    intercept[IllegalArgumentException](
      IsolationForest.fit(two, "vec", sampleSize = 1))
  }

  test("model catalog escapes params into valid JSON; embed_text rejects bad dims") {
    val tmp = java.nio.file.Files.createTempDirectory("mcat").toString
    val df = (1 to 50).map(i => (Seq(i.toFloat), 3.0 * i)).toDF("features", "y")
    val tm = UnifiedApi.train("linear_regression", df, "features", Some("y"),
      Map("note" -> """quo"te\back""", "k" -> "2"))
    graft.ml.ModelCatalog.append(spark, tmp, tm, Map("r2" -> 1.0))
    val params = graft.ml.ModelCatalog.load(spark, tmp)
      .select("parameters").head().getString(0)
    // must parse as strict JSON despite the quote/backslash in the value
    val parsed = spark.range(1).select(
      from_json(lit(params), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)).as("m")).head().getMap[String, String](0)
    assert(parsed("note") == """quo"te\back""")
    intercept[IllegalArgumentException](
      graft.functions.Embeddings.embedText("hi", "m", dim = -1))
    intercept[IllegalArgumentException](
      graft.functions.Embeddings.embedText("hi", "m", dim = 0))
  }

  test("whitened embeddings have ~unit variance per component") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val white = AutoMl.whitenEmbeddings(emb, "embedding", k = 4)
    val varByPos = white.select(posexplode(col("whitened")))
      .groupBy("pos").agg(variance(col("col")).as("v"))
      .select("v").as[Double].collect()
    varByPos.foreach(v => assert(math.abs(v - 1.0) < 0.05, s"variance $v"))
  }

  test("topic discovery groups vocabulary by cluster") {
    val corpus = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .join(Tables.read(spark, "/root/testdata/sf0.001", "documents"),
        col("vec_id") === col("doc_id"))
    val topics = AutoMl.discoverTopics(corpus, "text", "embedding", k = 3, topTerms = 4)
    assert(topics.count() == 3)
    assert(topics.select(size(col("top_terms"))).as[Int].collect().forall(_ == 4))
  }

  test("ensemble majority vote + AB assignment") {
    val m1 = UnifiedApi.train("logistic_regression", blobs, "features", Some("label"))
    val m2 = UnifiedApi.train("decision_tree", blobs, "features", Some("label"))
    val m3 = UnifiedApi.train("naive_bayes", blobs, "features", Some("label"))
    val ens = AutoMl.ensemblePredict(Seq(m1.modelId, m2.modelId, m3.modelId), blobs, "id")
    val joined = ens.join(blobs.select(col("id"), col("label")), "id")
    val acc = joined.filter(col("prediction") === col("label")).count().toDouble / blobs.count()
    assert(acc >= 0.95)
    val ab = AutoMl.abTestAssign(blobs, "id", 1L, 2L, 0.5)
    val counts = ab.groupBy("assigned_model").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(1L, 2L) && counts.values.forall(_ > 20))
    // deterministic routing
    val ab2 = AutoMl.abTestAssign(blobs, "id", 1L, 2L, 0.5)
    assert(ab.select("id", "assigned_model").collect().toSeq ==
      ab2.select("id", "assigned_model").collect().toSeq)
  }

  test("llm facade: deterministic stub complete/embed/rerank dispatch") {
    import graft.ml.Llm
    val c = Llm.complete("what is spark", "m")
    assert(c == Llm.complete("what is spark", "m") && c.startsWith("[stub-completion"))
    assert(Llm.llm("embed", Map("text" -> "x")).asInstanceOf[Array[Float]].length == 384)
    assert(Llm.llm("rerank", Map("query" -> "a b", "doc" -> "a b")).asInstanceOf[Double] > 0.99)
    intercept[IllegalArgumentException](Llm.llm("teleport", Map.empty))
  }

  test("vector_cast_dimension pads and truncates (neurondb--1.0.sql:1959)") {
    import graft.functions.{VectorOps => V}
    assert(V.castDimension(Array(1f, 2f, 3f), 2).toSeq == Seq(1f, 2f))
    assert(V.castDimension(Array(1f, 2f), 4).toSeq == Seq(1f, 2f, 0f, 0f))
    intercept[IllegalArgumentException](V.castDimension(Array(1f), 0))
  }

  test("lexicographic vector comparison + content hash") {
    import graft.functions.{VectorFunctions => VF}
    val df = Seq((Seq(1f, 2f), Seq(1f, 3f))).toDF("a", "b")
    val r = df.select(VF.ltUdf($"a", $"b"), VF.eqUdf($"a", $"a"), VF.geUdf($"b", $"a")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(VF.vectorHash(Seq(1f, 2f)) == VF.vectorHash(Seq(1f, 2f)))
    assert(VF.vectorHash(Seq(1f, 2f)) != VF.vectorHash(Seq(2f, 1f)))
  }
}
