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

  // --- image perceptual near-dup: dHash + exact Hamming banding ----------

  val ImageHashGridW = 10 // dHash comparisons per thumbnail row
  val ImageHashGridH = 6  // thumbnail rows; bits = 10*6 = 60, sign-safe in
                          // a BIGINT on both engines (the SimHashBits=60
                          // discipline — bit 63 would flip the sign)
  val ImageMaxHamming = 5 // near-dup distance budget; bands = 6 → exact
                          // recall by pigeonhole (see imageNearDups)

  /** Difference-hash (dHash, public algorithm) over a decoded grayscale
    * thumbnail: the image is box-averaged down to a (gridW+1)×gridH gray
    * grid and bit (r,c) is set when grid(c,r) > grid(c+1,r) — a 60-bit
    * perceptual fingerprint invariant to scaling and global
    * brightness/contrast shifts, the content-level image near-dup key a
    * multimodal crawl dedups on (header probes catch only byte-identical
    * assets).
    *
    * Decode runs partition-wise (javax.imageio — pure JVM; BMP/PNG/GIF
    * readers ship with the JDK) in the same mapPartitions shape as
    * [[featurize]]: per-partition init amortized, payloads streamed, no
    * driver-side collect. Undecodable payloads yield no row. Integer-only
    * arithmetic after decode (ITU-R 601 gray via (299r+587g+114b)/1000,
    * floor box averages) so any engine reproduces the hash bit for bit.
    */
  def imageDHash(media: DataFrame,
      gridW: Int = ImageHashGridW, gridH: Int = ImageHashGridH): DataFrame = {
    require(gridW * gridH <= 60,
      s"dhash bits ${gridW * gridH} > 60 would reach the BIGINT sign bit")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dhash", LongType)))
    val tw = gridW + 1
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null || img.getWidth < tw || img.getHeight < gridH) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val g = Array.ofDim[Long](gridH, tw)
          var cy = 0
          while (cy < gridH) {
            val y0 = cy * h / gridH; val y1 = (cy + 1) * h / gridH
            var cx = 0
            while (cx < tw) {
              val x0 = cx * w / tw; val x1 = (cx + 1) * w / tw
              var sum = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = img.getRGB(x, y)
                  sum += (299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                    114L * (p & 0xff)) / 1000L
                  x += 1
                }
                y += 1
              }
              val n = (x1 - x0).toLong * (y1 - y0)
              g(cy)(cx) = if (n > 0) sum / n else 0L
              cx += 1
            }
            cy += 1
          }
          var hash = 0L
          var rr = 0
          while (rr < gridH) {
            var cc = 0
            while (cc < gridW) {
              if (g(rr)(cc) > g(rr)(cc + 1)) hash |= 1L << (rr * gridW + cc)
              cc += 1
            }
            rr += 1
          }
          Some(Row(id, hash))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Near-duplicate image pairs by Hamming distance over [[imageDHash]]
    * fingerprints — EXACT multi-index Hamming search (Norouzi et al.
    * 2012), never all-pairs: the 60 bits split into `maxHamming+1`
    * disjoint bands, and by pigeonhole any pair within the distance
    * budget agrees exactly on ≥1 band, so the per-band equi-join
    * generates every qualifying pair (banding here is purely an
    * execution strategy, with provably identical output to brute force).
    *
    * Scale shape: one narrow band explode (maxHamming+1 rows/doc), a
    * hash-partitioned self-equi-join keyed (band, key) — bucket sizes
    * are ~N/2^bandBits under a uniform hash, and a skewed band key only
    * ever blows up its own bucket — then a codegen'd xor+bit_count per
    * candidate. At 1000 executors every stage is a keyed shuffle; no
    * driver state, no corpus×corpus product.
    */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = ImageMaxHamming,
      bits: Int = ImageHashGridW * ImageHashGridH): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = (bits + bands - 1) / bands
    val mask = (1L << bandBits) - 1
    val h = hashes.select(col("doc_id"), col("dhash"))
    val banded = h.select(col("doc_id"), col("dhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * bandBits).bitwiseAND(lit(mask))
            .as("key"))): _*)).as("bd"))
      .select(col("doc_id"), col("dhash"),
        col("bd.band").as("band"), col("bd.key").as("key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.dhash").as("hi"), col("b.dhash").as("hj"))
      .distinct()
    cand
      .select(col("i"), col("j"),
        bit_count(col("hi").bitwiseXOR(col("hj"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // --- deterministic image fixture (both engines recompute it) ------------

  val FixtureW = 22       // 2×2 source pixels per thumbnail cell (22 = 2·11)
  val FixtureH = 12
  val PlantOffset = 1000000L
  val PlantEvery = 50L
  val PerturbDelta = 60L  // gray shift on the planted twin's top-left block
  val PerturbX = 2        // x < 2 ∧ y < 4 = thumbnail cells (0,0),(0,1) →
  val PerturbY = 4        // ≤2 dhash bits differ, inside the ≤5 threshold

  /** Deterministic 24-bit BMP whose pixel (x,y) gray is a xor-folded
    * integer mix of (basisId, x, y) — `m = basisId·2654435761 + x·40503 +
    * y·10859; gray = (m ⊕ m≫7 ⊕ m≫15) mod 256` (each channel = gray),
    * with the planted-twin perturbation adding [[PerturbDelta]] on the
    * top-left block. The xor folds matter: a LINEAR pixel function makes
    * every document the same gradient shifted mod 256, dHashes collapse
    * to a handful of values, and the "near-dup" pair count goes
    * quadratic; the folded mix keeps unrelated images ~30 bits apart so
    * only planted twins qualify. Pure integer arithmetic (no int64
    * overflow: basisId ≤ ~2²¹ here), so the DuckDB oracle recomputes the
    * decoded pixels — and therefore the dHash — without any codec.
    * BMP rows are stored bottom-up; the builder writes file row fr from
    * image row H-1-fr so decode returns f(x, y) at image coordinates.
    */
  def syntheticGrayBmp(basisId: Long, w: Int, h: Int,
      perturb: Boolean): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h) // positive height = bottom-up rows
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var fr = 0
    while (fr < h) {
      val y = h - 1 - fr
      var x = 0
      while (x < w) {
        val m = basisId * 2654435761L + x * 40503L + y * 10859L
        var v = ((m ^ (m >> 7) ^ (m >> 15)) % 256).toInt
        if (perturb && x < PerturbX && y < PerturbY)
          v = (v + PerturbDelta.toInt) % 256
        b.put(v.toByte).put(v.toByte).put(v.toByte) // BGR, all = gray
        x += 1
      }
      var p = w * 3
      while (p < stride) { b.put(0.toByte); p += 1 }
      fr += 1
    }
    b.array()
  }

  /** Image-corpus fixture: one synthetic BMP per document plus a
    * perturbed twin (doc_id+[[PlantOffset]]) for every [[PlantEvery]]-th
    * document — the planted near-dups the gate and oracle both find.
    */
  def imageFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col("doc_id"), lit(false).as("perturb"))
      .unionAll(docs.filter(col("doc_id") % PlantEvery === 0)
        .select(col("doc_id"), lit(true).as("perturb")))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType)))
    val rdd = ids.rdd.mapPartitions { it =>
      it.map { r =>
        val basis = r.getLong(0)
        val perturb = r.getBoolean(1)
        val id = if (perturb) basis + PlantOffset else basis
        Row(id, syntheticGrayBmp(basis, FixtureW, FixtureH, perturb))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

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
