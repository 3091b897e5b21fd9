package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming similarity search: a PERSISTED static IVF index
 * ([[graft.ext.Embeddings.saveIvfIndex]] — train once, query forever),
 * QUERY VECTORS streaming. This is the production ANN serving shape: the
 * index changes on corpus rebuilds; embeddings of fresh documents/queries
 * arrive forever and each wants its top-k neighbors.
 *
 * Plan shape — exactly ONE stateful operator:
 *
 *   1. probe assignment is ROW-LOCAL: the stored codebook is model-sized
 *      (kClusters·dim), so it collapses to a SQL literal and each query
 *      row computes its nprobe nearest centroids with array HOFs — no
 *      stream-side aggregate, no window, no rank (the batch twin's
 *      row_number assignment has no streaming spelling; the literal fold
 *      is the same arithmetic on the same snapped grid);
 *   2. candidates come from the stream-static equi-join on the probed
 *      list id against the cid-partitioned lists scan (each micro-batch
 *      touches only its queries' probed directories);
 *   3. the top-k cut is one watermark-finalized (query, ts) aggregate in
 *      append mode: collect the candidate list, sort and slice it
 *      ROW-LOCALLY (k·struct rows per query — result-sized state,
 *      bounded by in-flight queries inside the watermark horizon).
 *
 * Scores snap to the 1e-6 grid with the batch's exact spelling, so the
 * emitted (query_id, rank, vec_id, cosine) rows are bit-identical to
 * [[graft.ext.Embeddings.ivfIndexTopK]] over the same index — pinned by
 * the parity spec. (Floating sums ARE re-ordered between the batch
 * shuffle aggregate and the row-local fold; the snap grid is what makes
 * that invisible, the same argument every oracle here leans on.)
 */
object EmbeddingsStream {

  /**
   * Top-k neighbors for streaming queries against the index at `dir`.
   * `queries` is a streaming DataFrame (query_id, ts, embedding:
   * array<float>); emits (query_id, rank, vec_id, cosine) once the
   * watermark passes the query's event time.
   */
  def ivfIndexTopK(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, nprobe: Int = 2,
      watermark: String = "10 seconds"): DataFrame = {
    require(k > 0 && nprobe > 0)
    graft.functions.GraftFunctions.register(spark)
    val centRows = spark.read.parquet(s"$dir/centroids").collect()
    require(centRows.nonEmpty, s"no centroids at $dir — saveIvfIndex first")
    val byCid = centRows
      .groupBy(r => r.getAs[Number]("cid").longValue())
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getAs[Number]("i").intValue())
          .map(_.getAs[Double]("c"))
      }
    val centLit = byCid.toSeq.sortBy(_._1).map { case (cid, cs) =>
      s"struct(CAST($cid AS BIGINT) AS cid, array(${cs.mkString(", ")}) AS c)"
    }.mkString("array(", ", ", ")")
    def snapSql(e: String) = s"floor(($e) * 1e6 + 0.50001) / 1e6"
    val d2Sql = snapSql(
      "aggregate(zip_with(qd, s.c, (a, b) -> (a - b) * (a - b)), " +
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    val lists = spark.read.parquet(s"$dir/lists")
    val probes = queries
      .withWatermark("ts", watermark)
      .select(col("query_id"), col("ts"), col("embedding"))
      .withColumn("qd", expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
      .withColumn("qnrm", expr("sqrt(float_dot(embedding, embedding))"))
      .withColumn("pc", explode(expr(
        s"slice(sort_array(transform($centLit, " +
          s"s -> struct($d2Sql AS d2, s.cid AS cid))), 1, $nprobe)")))
      .select(col("query_id"), col("ts"), col("embedding"), col("qnrm"),
        col("pc.cid").as("cid"))
    probes.join(lists, Seq("cid"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("ts"), col("vec_id"),
        expr(snapSql("float_dot(embedding, emb) / (qnrm * nrm)")).as("cosine"))
      .groupBy(col("query_id"), col("ts"))
      .agg(expr(s"slice(sort_array(collect_list(" +
        s"struct(-cosine AS nc, vec_id AS vec_id, cosine AS cosine))), 1, $k)")
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.vec_id").as("vec_id"), col("col.cosine").as("cosine"))
  }
}
