package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * IVF-PQ (IVFADC, Jégou et al., "Product Quantization for Nearest
 * Neighbor Search", TPAMI 2011) — the composition of the [[Ivf]]
 * coarse index and the [[Pq]] codec that the reference exposes as
 * separate primitives (`ivf` access method + `train_pq_codebook`/
 * `pq_asymmetric_distance`), and the memory shape 100 TB serving
 * actually requires: the scanned posting lists hold m-byte codes
 * (64-384× smaller than raw float vectors), the query pays one
 * 256×m lookup-table build, and raw vectors are touched only for the
 * final exact rerank of a candidate pool.
 *
 * Search = route to nprobe lists → ADC scan of the probed lists'
 * CODES (file-pruned by cluster_id, lookup-table adds per row) →
 * exact rerank of the top `rerankPool` candidates against raw
 * vectors. With nprobe = nlists and rerankPool ≥ corpus the result
 * provably equals brute force (BASELINE.md's recall convention);
 * between those extremes nprobe and rerankPool are the recall/cost
 * dials.
 */
object IvfPq {

  case class IvfPqModel(ivf: Ivf.IvfModel, codebook: Pq.PqCodebook,
                        encoded: DataFrame, idCol: String)

  /** Train coarse quantizer + PQ codebook, encode every row. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            nlists: Int = 16, m: Int = 8, seed: Long = 42L): IvfPqModel = {
    val ivf = Ivf.build(df, vecCol, nlists, seed)
    val cb = Pq.train(ivf.assigned, vecCol, m)
    IvfPqModel(ivf, cb, Pq.encodeTable(ivf.assigned, vecCol, cb), idCol)
  }

  /** IVFADC top-k: ADC candidates from the probed lists, exact rerank
    * of the pool, deterministic id tiebreaks at both stages. */
  def search(model: IvfPqModel, query: Array[Float], k: Int = 10,
             nprobe: Int = 8, rerankPool: Int = 64,
             metric: String = "l2"): DataFrame = {
    val probes = model.ivf.route(query, nprobe)
    val probed = model.encoded.filter(col("cluster_id").isin(probes: _*))
    Pq.search(probed, model.codebook, query,
        k = math.max(k, rerankPool), tieBreak = Seq(model.idCol))
      .withColumn("distance",
        Knn.distCol(metric)(col(model.ivf.vecCol), lit(query)))
      .orderBy(col("distance"), col(model.idCol))
      .limit(k)
      .drop("adc_distance", "pq_codes", "cluster_id")
  }
}
