package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Autoencoder (d → k → d, sigmoid hidden, linear output) with a
 * replayable training contract — the oracle-checkable counterpart of
 * [[Dimensionality.autoencoderTrain]] (reference `ml_autoencoder.c`),
 * completing the fixpoint family (kmeans/whiten/iforest/gcn).
 *
 * Differences from the production trainer that make the oracle possible:
 *  - gradients are plain UNORDERED DataFrame sums (the production path
 *    merges partials in partition-index order, which SQL cannot see);
 *    cross-engine drift is ~1e-15/epoch, ten orders below the round-4
 *    output after the fixed epoch count;
 *  - every per-row computation (forward, backprop, reconstruction
 *    error) folds left-to-right in coordinate order, matching the
 *    oracle's `list_reduce`;
 *  - Xavier init is the same u01-hash stream as the production trainer
 *    (`(u01(seed ⊕ i)·2 − 1)·√(6/(d+k))`) — exact in SQL.
 *
 * Shape: broadcast weights, ONE model-sized gradient aggregation per
 * epoch (2dk+d+k cells), update on the driver — full-batch GD like the
 * production path.
 */
object AeFixpoint {

  @inline private def sigmoid(a: Double): Double = 1.0 / (1.0 + math.exp(-a))

  /** Train on the first `d` coordinates of `vecCol` and return
    * (idCol, sq_error) — the per-row reconstruction error. */
  def score(df: DataFrame, idCol: String, vecCol: String,
            d: Int = 8, k: Int = 2, epochs: Int = 12,
            lr: Double = 0.5, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val sliceUdf = udf((v: Seq[Float]) => {
      val out = new Array[Double](d)
      var j = 0
      while (j < d) { out(j) = v(j).toDouble; j += 1 }
      out.toSeq
    })
    val tr = df.select(col(idCol).cast("long").as("id"),
      sliceUdf(col(vecCol)).as("xs")).persist()
    try {
      val n = tr.count()
      val x1 = math.sqrt(6.0 / (d + k))
      val w1 = Array.tabulate(k, d)((c, j) => (Explain.u01(seed ^ (c * d + j).toLong) * 2 - 1) * x1)
      val b1 = new Array[Double](k)
      val w2 = Array.tabulate(d, k)((i, c) => (Explain.u01(~seed ^ (i * k + c).toLong) * 2 - 1) * x1)
      val b2 = new Array[Double](d)

      // flat gradient layout: [gW1 k·d | gb1 k | gW2 d·k | gb2 d].
      // The model travels by CLOSURE CAPTURE of the four mutable
      // arrays (task closures re-serialize on every job submission),
      // so ONE udf instance serves every epoch — the former per-epoch
      // broadcast+udf rebuild generated fresh codegen each epoch (the
      // QualityClf r11 JIT-tail finding; same fix).
      val gLen = k * d + k + d * k + d
      val gradU = {
        val (ww1, bb1, ww2, bb2) = (w1, b1, w2, b2)
        udf((xs: Seq[Double]) => {
          val h = new Array[Double](k)
          var c = 0
          while (c < k) {
            var z = 0.0
            var j = 0
            while (j < d) { z += ww1(c)(j) * xs(j); j += 1 }
            h(c) = sigmoid(z + bb1(c))
            c += 1
          }
          val err = new Array[Double](d)
          var i = 0
          while (i < d) {
            var z = 0.0
            c = 0
            while (c < k) { z += ww2(i)(c) * h(c); c += 1 }
            err(i) = (z + bb2(i)) - xs(i)
            i += 1
          }
          val delta = new Array[Double](k)
          c = 0
          while (c < k) {
            var s = 0.0
            i = 0
            while (i < d) { s += ww2(i)(c) * err(i); i += 1 }
            delta(c) = s * h(c) * (1.0 - h(c))
            c += 1
          }
          val g = new Array[Double](gLen)
          c = 0
          while (c < k) {
            var j = 0
            while (j < d) { g(c * d + j) = delta(c) * xs(j); j += 1 }
            g(k * d + c) = delta(c)
            c += 1
          }
          i = 0
          while (i < d) {
            c = 0
            while (c < k) { g(k * d + k + i * k + c) = err(i) * h(c); c += 1 }
            g(k * d + k + d * k + i) = err(i)
            i += 1
          }
          g.toSeq
        })
      }
      // `def`, NOT `val`: a reused Dataset object would reuse its
      // SHUFFLE STAGE across jobs (same shuffleId -> DAGScheduler
      // serves the map outputs computed with epoch-1 weights), so the
      // gradient must be a FRESH QueryExecution each epoch. The udf
      // instance stays the same, so the generated code string is
      // identical and the codegen cache absorbs the rebuild.
      def gradPlan = tr.select(posexplode(gradU(col("xs"))).as(Seq("gi", "gv")))
        .groupBy("gi").agg(sum("gv").as("g"))

      for (_ <- 1 to epochs) {
        val sums = gradPlan
          .collect().map(r => (r.getAs[Int]("gi"), r.getAs[Double]("g"))).toMap
        var c = 0
        while (c < k) {
          var j = 0
          while (j < d) { w1(c)(j) -= lr * (sums.getOrElse(c * d + j, 0.0) / n); j += 1 }
          b1(c) -= lr * (sums.getOrElse(k * d + c, 0.0) / n)
          c += 1
        }
        var i = 0
        while (i < d) {
          c = 0
          while (c < k) { w2(i)(c) -= lr * (sums.getOrElse(k * d + k + i * k + c, 0.0) / n); c += 1 }
          b2(i) -= lr * (sums.getOrElse(k * d + k + d * k + i, 0.0) / n)
          i += 1
        }
      }

      val (ww1s, bb1s, ww2s, bb2s) = (w1, b1, w2, b2)
      val seUdf = udf((xs: Seq[Double]) => {
        val (ww1, bb1, ww2, bb2) = (ww1s, bb1s, ww2s, bb2s)
        val h = new Array[Double](k)
        var c = 0
        while (c < k) {
          var z = 0.0
          var j = 0
          while (j < d) { z += ww1(c)(j) * xs(j); j += 1 }
          h(c) = sigmoid(z + bb1(c))
          c += 1
        }
        var se = 0.0
        var i = 0
        while (i < d) {
          var z = 0.0
          c = 0
          while (c < k) { z += ww2(i)(c) * h(c); c += 1 }
          val e = (z + bb2(i)) - xs(i)
          se += e * e
          i += 1
        }
        se
      })
      // materialize BEFORE the finally releases tr — the returned frame is
      // otherwise lazy and the scoring pass would recompute the slice UDF
      // from source after unpersist (same contract as Dedup.simhashPairs)
      tr.select(col("id").as(idCol), seUdf(col("xs")).as("sq_error"))
        .localCheckpoint(true)
    } finally tr.unpersist()
  }

  // ------------------------------------------------------------------
  // DuckDB unroll
  // ------------------------------------------------------------------

  private def mixCtes(p: String, src: String, carry: Seq[String],
                      zExpr: String): String =
    graft.functions.Mix64Sql.ctes(p, src, carry, zExpr)

  def oracleSql(table: String, idCol: String, vecCol: String,
                filter: String, d: Int, k: Int, epochs: Int,
                lr: Double, seed: Long): String = {
    val u01 = "(z // 2048)::DOUBLE / 9007199254740992.0"
    val x1 = s"sqrt(6.0 / ${d + k})"
    val sb = new StringBuilder
    sb ++= s"""WITH tr AS MATERIALIZED (
      |  SELECT $idCol AS id,
      |    list_transform($vecCol[1:$d], x -> CAST(x AS DOUBLE)) AS xs
      |  FROM $table WHERE $filter),
      |nn AS MATERIALIZED (SELECT count(*) AS n FROM tr),
      |i1 AS MATERIALIZED (SELECT i FROM range(0, ${k * d}) t(i)),
      |${mixCtes("mw1", "i1", Seq("i"), s"xor(CAST($seed AS BIGINT), i)")},
      |w1_0 AS MATERIALIZED (
      |  SELECT CAST(i // $d AS INTEGER) AS c, CAST(i % $d AS INTEGER) AS j,
      |         ($u01 * 2 - 1) * $x1 AS v FROM mw16),
      |i2 AS MATERIALIZED (SELECT i FROM range(0, ${d * k}) t(i)),
      |${mixCtes("mw2", "i2", Seq("i"), s"xor(CAST(${~seed} AS BIGINT), i)")},
      |w2_0 AS MATERIALIZED (
      |  SELECT CAST(i // $k AS INTEGER) AS i, CAST(i % $k AS INTEGER) AS c,
      |         ($u01 * 2 - 1) * $x1 AS v FROM mw26),
      |b1_0 AS MATERIALIZED (SELECT CAST(c AS INTEGER) AS c, 0.0 AS v FROM range(0, $k) t(c)),
      |b2_0 AS MATERIALIZED (SELECT CAST(i AS INTEGER) AS i, 0.0 AS v FROM range(0, $d) t(i))""".stripMargin
    def forward(e: Int, wSuf: String): String =
      s""",
        |w1l_$e AS MATERIALIZED (SELECT c, list(v ORDER BY j) AS l FROM w1_$wSuf GROUP BY c),
        |w2l_$e AS MATERIALIZED (SELECT i, list(v ORDER BY c) AS l FROM w2_$wSuf GROUP BY i),
        |w2cl_$e AS MATERIALIZED (SELECT c, list(v ORDER BY i) AS l FROM w2_$wSuf GROUP BY c),
        |h_$e AS MATERIALIZED (
        |  SELECT t.id, w.c,
        |    1.0 / (1.0 + exp(-(list_reduce(list_prepend(0.0,
        |      list_transform(range(1, ${d + 1}), j -> w.l[j] * t.xs[j])),
        |      (a, b) -> a + b) + b1.v))) AS h
        |  FROM tr t, w1l_$e w JOIN b1_$wSuf b1 ON b1.c = w.c),
        |hl_$e AS MATERIALIZED (SELECT id, list(h ORDER BY c) AS l FROM h_$e GROUP BY id),
        |err_$e AS MATERIALIZED (
        |  SELECT t.id, w.i,
        |    (list_reduce(list_prepend(0.0,
        |      list_transform(range(1, ${k + 1}), c -> w.l[c] * hl.l[c])),
        |      (a, b) -> a + b) + b2.v) - t.xs[w.i + 1] AS e
        |  FROM tr t JOIN hl_$e hl ON hl.id = t.id,
        |       w2l_$e w JOIN b2_$wSuf b2 ON b2.i = w.i)""".stripMargin
    for (e <- 1 to epochs) {
      val p = e - 1
      sb ++= forward(e, p.toString)
      sb ++= s""",
        |errl_$e AS MATERIALIZED (SELECT id, list(e ORDER BY i) AS l FROM err_$e GROUP BY id),
        |delta_$e AS MATERIALIZED (
        |  SELECT h.id, h.c,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(range(1, ${d + 1}), i -> w.l[i] * el.l[i])),
        |      (a, b) -> a + b) * h.h * (1.0 - h.h) AS dv
        |  FROM h_$e h JOIN errl_$e el ON el.id = h.id
        |             JOIN w2cl_$e w ON w.c = h.c),
        |w1_$e AS MATERIALIZED (
        |  SELECT w.c, w.j, w.v - $lr * (g.g / (SELECT n FROM nn)) AS v
        |  FROM w1_$p w JOIN (
        |    SELECT dl.c, rr.j, sum(dl.dv * t.xs[rr.j + 1]) AS g
        |    FROM delta_$e dl JOIN tr t ON t.id = dl.id, range(0, $d) rr(j)
        |    GROUP BY 1, 2) g ON g.c = w.c AND g.j = w.j),
        |b1_$e AS MATERIALIZED (
        |  SELECT b.c, b.v - $lr * (g.g / (SELECT n FROM nn)) AS v
        |  FROM b1_$p b JOIN (SELECT c, sum(dv) AS g FROM delta_$e GROUP BY c) g
        |    ON g.c = b.c),
        |w2_$e AS MATERIALIZED (
        |  SELECT w.i, w.c, w.v - $lr * (g.g / (SELECT n FROM nn)) AS v
        |  FROM w2_$p w JOIN (
        |    SELECT er.i, h.c, sum(er.e * h.h) AS g
        |    FROM err_$e er JOIN h_$e h ON h.id = er.id
        |    GROUP BY 1, 2) g ON g.i = w.i AND g.c = w.c),
        |b2_$e AS MATERIALIZED (
        |  SELECT b.i, b.v - $lr * (g.g / (SELECT n FROM nn)) AS v
        |  FROM b2_$p b JOIN (SELECT i, sum(e) AS g FROM err_$e GROUP BY i) g
        |    ON g.i = b.i)""".stripMargin
    }
    sb ++= forward(epochs + 1, epochs.toString)
    sb ++= s""",
      |errl_${epochs + 1} AS MATERIALIZED (
      |  SELECT id, list(e ORDER BY i) AS l FROM err_${epochs + 1} GROUP BY id)
      |SELECT el.id AS $idCol,
      |  CAST(list_reduce(list_prepend(0.0,
      |    list_transform(el.l, x -> x * x)), (a, b) -> a + b) AS REAL) AS sq_error
      |FROM errl_${epochs + 1} el""".stripMargin
    sb.toString
  }
}
