package graft

import org.apache.spark.sql.functions._
import graft.ml.KmeansFixpoint

class KmeansFixpointSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("id", "vec")

  test("well-separated blobs cluster by blob; init = first k by id") {
    // two tight blobs far apart; ids interleaved so init picks one from each
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f))
    }
    val out = KmeansFixpoint.assign(mkDf(rows), "id", "vec", k = 2, iters = 3)
      .as[(Long, Int)].collect().toMap
    val evens = (0 until 20 by 2).map(i => out(i.toLong)).toSet
    val odds = (1 until 20 by 2).map(i => out(i.toLong)).toSet
    assert(evens.size == 1 && odds.size == 1 && evens != odds)
    // id 0 (first center) keeps cluster 0, id 1 keeps cluster 1
    assert(out(0L) == 0 && out(1L) == 1)
  }

  test("deterministic across runs and repartitioning") {
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq((i * 37 % 11).toFloat, (i * 53 % 7).toFloat, (i * 29 % 13).toFloat)))
    val a = KmeansFixpoint.assign(mkDf(rows), "id", "vec", k = 3, iters = 4)
      .as[(Long, Int)].collect().sorted.toSeq
    val b = KmeansFixpoint.assign(mkDf(rows).repartition(7), "id", "vec", k = 3, iters = 4)
      .as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.size == 3)
  }

  test("matches a local reference implementation of the same recurrence") {
    val rows = (0 until 40).map(i =>
      (i.toLong, Seq((math.sin(i) * 3).toFloat, (math.cos(i * 2) * 3).toFloat)))
    val k = 3; val iters = 4; val scale = 1e6

    // local mirror: same integer scaling, same fold order, same tie-break
    val pts = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale + 0.5).toLong).toArray
    }
    var centers = pts.sortBy(_._1).take(k).map(_._2.map(_.toDouble))
    var assignment = Map.empty[Long, Int]
    for (i <- 1 to iters) {
      assignment = pts.map { case (id, xs) =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- centers.indices) {
          var s = 0.0
          for (j <- xs.indices) { val t = xs(j).toDouble - centers(c)(j); s += t * t }
          if (s < bestD) { bestD = s; best = c }
        }
        id -> best
      }.toMap
      if (i < iters) {
        centers = centers.zipWithIndex.map { case (old, c) =>
          val members = pts.filter(p => assignment(p._1) == c).map(_._2)
          if (members.isEmpty) old
          else old.indices.map(j => members.map(_(j)).sum.toDouble / members.length).toArray
        }
      }
    }

    val out = KmeansFixpoint.assign(mkDf(rows), "id", "vec", k = k, iters = iters)
      .as[(Long, Int)].collect().toMap
    assert(out == assignment)
  }
}
