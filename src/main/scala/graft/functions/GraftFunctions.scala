package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of the full SQL function surface — the analog of
  * installing the reference extension (`CREATE EXTENSION neurondb`). After
  * this, `spark.sql` can use every `vector_*`, `embed_*`, quantization,
  * text-analysis and sparse function by its reference name. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    VectorFunctions.register(spark)
    VectorAggregates.register(spark)
    Embeddings.register(spark)
    TextFunctions.register(spark)
    TextAnalysis.register(spark)
    Quantization.register(spark)
    SparseOps.register(spark)
  }
}
