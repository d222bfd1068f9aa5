package graft

import graft.functions.GraftFunctions

/** The SQL-registration surface: after registerAll, reference function
  * names work in plain spark.sql — the CREATE EXTENSION experience. */
class SqlSurfaceSpec extends SparkSpecBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.registerAll(spark)
    Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("embeddings_v")
  }

  test("distance + norm functions by reference name") {
    val r = spark.sql(
      """SELECT vector_l2_distance(array(1.0F,2.0F,3.0F), array(4.0F,5.0F,6.0F)) AS l2,
        |       vector_cosine_distance(array(1.0F,2.0F,3.0F), array(4.0F,5.0F,6.0F)) AS cos,
        |       vector_norm(array(3.0F,4.0F)) AS nrm,
        |       vector_dims(array(1.0F,2.0F)) AS d""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 5.196152) < 1e-6)
    assert(math.abs(r.getDouble(1) - 0.025368) < 1e-6)
    assert(r.getDouble(2) == 5.0 && r.getInt(3) == 2)
  }

  test("kNN in pure SQL over a view") {
    val top = spark.sql(
      """SELECT vec_id FROM embeddings_v
        |ORDER BY vector_l2_distance(embedding,
        |  (SELECT first(embedding) FROM embeddings_v WHERE vec_id = 0)), vec_id
        |LIMIT 3""".stripMargin).collect().map(_.getLong(0))
    assert(top.head == 0L)
  }

  test("vector aggregate in SQL") {
    val r = spark.sql(
      "SELECT label, vector_avg(embedding) AS c FROM embeddings_v GROUP BY label")
    assert(r.count() == 10)
    assert(r.head().getSeq[Float](1).length == 64)
  }

  test("embedding, chunking, quantization, text analysis in SQL") {
    val r = spark.sql(
      """SELECT size(embed_text('hello', 'm')) AS edim,
        |       size(chunk_text('abcdefghij', 4, 2)) AS nchunks,
        |       int8_to_vector(vector_to_int8(array(1.0F, -1.0F)))[0] AS deq,
        |       lang_id('the cat and the dog went to the park and it was') AS lang,
        |       ws_token_count('a b c') AS wc,
        |       size(hf_tokenize('tokenizer test')) AS ntok""".stripMargin).head()
    assert(r.getInt(0) == 384 && r.getInt(1) == 5)
    assert(r.getFloat(2) == 1.0f)
    assert(r.getString(3) == "en" && r.getInt(4) == 3 && r.getInt(5) >= 3)
  }

  test("sparse functions in SQL") {
    val r = spark.sql(
      """SELECT sparse_vector_dot_product(5, array(0,2), array(1.0F,2.0F),
        |                                 5, array(2,4), array(3.0F,1.0F)) AS dot""".stripMargin).head()
    assert(r.getDouble(0) == 6.0)
  }
}
