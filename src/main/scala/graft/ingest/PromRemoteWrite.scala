package graft.ingest

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.xerial.snappy.Snappy

import graft.model.Tables

/** Prometheus remote-write ingest (`/api/v1/prom/remote/write`,
  * `writer/utils/unmarshal/metrics_protobuf.go:1-77`): snappy-compressed
  * protobuf `WriteRequest`. The message schema is tiny, so the decoder
  * reads the protobuf WIRE FORMAT directly (varints + length-delimited
  * fields — a public, stable format) instead of depending on a protobuf
  * runtime this environment doesn't ship:
  *
  * {{{
  * WriteRequest { repeated TimeSeries timeseries = 1; }
  * TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  * Label        { string name = 1; string value = 2; }
  * Sample       { double value = 1; int64 timestamp = 2; }  // ms
  * }}}
  *
  * Decoding runs partition-wise over request bodies (the same
  * mapPartitions batch shape as the multimodal featurizer) and lands in
  * the canonical metric-sample frame (labels map, timestamp_ns, value).
  */
object PromRemoteWrite {

  // --- protobuf wire primitives ------------------------------------------

  private def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = pos
    while ({
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      shift += 7; p += 1
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, payload.length)
    out.write(payload)
  }

  // --- decode -------------------------------------------------------------

  private def parseLabel(b: Array[Byte], from: Int, to: Int): (String, String) = {
    var p = from; var name = ""; var value = ""
    while (p < to) {
      val (tag, p1) = readVarint(b, p)
      val (len, p2) = readVarint(b, p1)
      val s = new String(b, p2, len.toInt, "UTF-8")
      if ((tag >> 3) == 1) name = s else value = s
      p = p2 + len.toInt
    }
    (name, value)
  }

  private def parseSample(b: Array[Byte], from: Int, to: Int): (Double, Long) = {
    var p = from; var v = 0.0; var ts = 0L
    while (p < to) {
      val (tag, p1) = readVarint(b, p)
      (tag >> 3, tag & 7) match {
        case (1, 1) => // fixed64 double, little-endian
          v = java.lang.Double.longBitsToDouble(
            java.nio.ByteBuffer.wrap(b, p1, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
          p = p1 + 8
        case (2, 0) =>
          val (t, p2) = readVarint(b, p1); ts = t; p = p2
        case (_, 2) =>
          val (len, p2) = readVarint(b, p1); p = p2 + len.toInt
        case other => throw new IllegalArgumentException(s"sample field $other")
      }
    }
    (v, ts)
  }

  /** One WriteRequest body → (labels, timestamp_ms, value) tuples. */
  def parseWriteRequest(compressed: Array[Byte]): Seq[(Map[String, String], Long, Double)] = {
    val b = Snappy.uncompress(compressed)
    val out = scala.collection.mutable.ArrayBuffer[(Map[String, String], Long, Double)]()
    var p = 0
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      require((tag >> 3) == 1 && (tag & 7) == 2, s"unexpected WriteRequest field $tag")
      val (tsLen, p2) = readVarint(b, p1)
      val tsEnd = p2 + tsLen.toInt
      // TimeSeries
      var q = p2
      val labels = scala.collection.mutable.Map[String, String]()
      val samples = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
      while (q < tsEnd) {
        val (ftag, q1) = readVarint(b, q)
        val (len, q2) = readVarint(b, q1)
        val end = q2 + len.toInt
        (ftag >> 3) match {
          case 1 => labels += parseLabel(b, q2, end)
          case 2 => samples += parseSample(b, q2, end)
          case _ => // unknown field: skip
        }
        q = end
      }
      // sanitizeLabels (`unmarshal.go:274-282`, applied by the reference's
      // remote-write path at `metrics_protobuf.go:32`): key regex + 100-char
      // value truncation — plain JVM code here since decode is already
      // partition-side Scala
      val lm = labels.toMap.map { case (k, v) =>
        LabelSanitizeRe.replaceAllIn(k, "_") ->
          (if (v.length > 100) v.substring(0, 100) + "..." else v)
      }
      samples.foreach { case (v, ts) => out += ((lm, ts, v)) }
      p = tsEnd
    }
    out.toSeq
  }

  private val LabelSanitizeRe = "(^[^a-zA-Z_]|[^a-zA-Z0-9_])".r

  private val rowSchema = StructType(Seq(
    StructField("labels", MapType(StringType, StringType)),
    StructField("timestamp_ns", LongType),
    StructField("value", DoubleType)))

  /** Decode request bodies (binary `body` column) → canonical metric
    * samples (ms → ns).
    */
  def decode(bodies: DataFrame): DataFrame = {
    val spark = bodies.sparkSession
    val rdd = bodies.select(col("body")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        parseWriteRequest(r.getAs[Array[Byte]](0)).map { case (lm, tsMs, v) =>
          Row(lm, tsMs * 1000000L, v)
        }
      }
    }
    spark.createDataFrame(rdd, rowSchema)
      .withColumn("fingerprint", Tables.fingerprintOf(col("labels")))
  }

  // --- encode (client side of the round trip) -----------------------------

  def encodeWriteRequest(series: Seq[(Map[String, String], Seq[(Long, Double)])]): Array[Byte] = {
    val req = new ByteArrayOutputStream()
    series.foreach { case (labels, samples) =>
      val ts = new ByteArrayOutputStream()
      labels.toSeq.sortBy(_._1).foreach { case (n, v) =>
        val l = new ByteArrayOutputStream()
        writeLenDelim(l, 1, n.getBytes("UTF-8"))
        writeLenDelim(l, 2, v.getBytes("UTF-8"))
        writeLenDelim(ts, 1, l.toByteArray)
      }
      samples.foreach { case (tsMs, v) =>
        val s = new ByteArrayOutputStream()
        writeVarint(s, (1 << 3) | 1)
        val buf = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v)
        s.write(buf.array())
        writeVarint(s, (2 << 3) | 0)
        writeVarint(s, tsMs)
        writeLenDelim(ts, 2, s.toByteArray)
      }
      writeLenDelim(req, 1, ts.toByteArray)
    }
    Snappy.compress(req.toByteArray)
  }

  /** Encode a canonical metric frame into one WriteRequest per series. */
  def encode(samples: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    val rdd = samples
      .select(col("labels"), col("timestamp_ns"), col("value"))
      .rdd.map(r => (r.getMap[String, String](0).toMap,
        (r.getLong(1) / 1000000L, r.getDouble(2))))
      .groupBy(_._1)
      .map { case (labels, rows) =>
        Row(encodeWriteRequest(Seq((labels, rows.map(_._2).toSeq))))
      }
    spark.createDataFrame(rdd,
      StructType(Seq(StructField("body", BinaryType))))
  }
}
