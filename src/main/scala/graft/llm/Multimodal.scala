package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature steps as partition-wise batch functions.
  *
  * The DECODE step is a deterministic STUB — this container has no image/
  * audio codecs, so `featurize` computes a 16-bin byte histogram where a
  * real deployment would run the decoder. Everything around it (schema,
  * batching via mapPartitions, explode of per-item features, partition
  * sizing) is the real 100 TB plumbing: binary payloads stay columnar in
  * parquet, the featurizer streams one partition at a time (no collect),
  * and the output is a narrow (id, bin, value) frame.
  */
object Multimodal {

  val FeatureBins = 16

  /** Media table derived from documents: UTF-8 payload bytes as the opaque
    * binary column (stands in for image/audio payloads).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    graft.model.Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime"),
      length(col("text")).cast("long").as("n_bytes"))

  /** Batch featurizer: partition-wise iteration (the mapPartitions shape a
    * codec-backed decoder needs — amortized per-partition init, no
    * per-row JNI). STUB: byte histogram mod FeatureBins.
    */
  def featurize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      // per-partition "decoder" init would go here
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](FeatureBins)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) % FeatureBins) += 1.0
          i += 1
        }
        Row(id, hist.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Histogram features as a narrow exploded frame (doc_id, bin, cnt). */
  def featureHistogram(spark: SparkSession, dir: String): DataFrame =
    featurize(mediaTable(spark, dir))
      .select(col("doc_id"), posexplode(col("feature")).as(Seq("bin", "cnt")))
      .select(col("doc_id"), col("bin").cast("long").as("bin"), col("cnt"))

  /** Frame sampling: byte slice [i·len/n, (i+1)·len/n) of each payload for
    * frame i — the video-frame / audio-chunk access pattern (offset+length
    * on the binary column, row blowup bounded by n).
    */
  def frameSlices(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__start",
        (col("frame_idx") * col("n_bytes") / n).cast("long") + 1)
      .withColumn("__end",
        ((col("frame_idx") + 1) * col("n_bytes") / n).cast("long") + 1)
      .select(col("doc_id"), col("frame_idx"),
        expr("substr(media, __start, __end - __start)").as("frame"),
        (col("__end") - col("__start")).as("frame_bytes"))
}
