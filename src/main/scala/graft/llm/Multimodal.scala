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
      bits: Int = ImageHashGridW * ImageHashGridH): DataFrame =
    hammingNearDups(hashes, "dhash", maxHamming, bits)

  /** The generic exact multi-index Hamming engine behind [[imageNearDups]]
    * and [[audioNearDups]] — works over any ≤63-bit fingerprint column.
    */
  private def hammingNearDups(hashes: DataFrame, hashCol: String,
      maxHamming: Int, bits: Int): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = (bits + bands - 1) / bands
    val mask = (1L << bandBits) - 1
    val h = hashes.select(col("doc_id"), col(hashCol).as("__fp"))
    val banded = h.select(col("doc_id"), col("__fp"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__fp"), b * bandBits).bitwiseAND(lit(mask))
            .as("key"))): _*)).as("bd"))
      .select(col("doc_id"), col("__fp"),
        col("bd.band").as("band"), col("bd.key").as("key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.__fp").as("hi"), col("b.__fp").as("hj"))
      .distinct()
    cand
      .select(col("i"), col("j"),
        bit_count(col("hi").bitwiseXOR(col("hj"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // --- audio perceptual fingerprint: energy-envelope sign deltas ----------

  val AudioFpBits = 60      // sign-safe BIGINT, same discipline as dHash
  val AudioFrameSamples = 40
  val AudioMaxHamming = 5   // bands = 6 → exact recall by pigeonhole

  /** Audio perceptual fingerprint over PCM WAV payloads: frame the signal
    * ([[AudioFrameSamples]] samples per frame), compute per-frame energy
    * Σs², and set bit f when energy(f+1) > energy(f) — the
    * sign-of-energy-delta primitive of the Haitsma-Kalker (2002) audio
    * fingerprint, with the 33-band filterbank simplified to the full-band
    * envelope (the filterbank needs an FFT; the envelope needs only
    * integer arithmetic, so the DuckDB oracle replays it exactly). Robust
    * to gain changes that preserve energy ordering and to codec-level
    * noise far below frame energy; the content-level audio near-dup key a
    * multimodal crawl dedups on.
    *
    * WAV decode is a pure-JVM chunk walk (RIFF → fmt/data; PCM 16-bit
    * mono) in the same mapPartitions shape as [[imageDHash]]; payloads
    * that are not mono PCM16 WAV, or carry fewer than two frames, yield
    * no row.
    */
  def audioFingerprint(media: DataFrame,
      frameSamples: Int = AudioFrameSamples): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("afp", LongType)))
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        decodeWavPcm16Mono(b) match {
          case None => None
          case Some(samples) =>
            val nFrames = math.min(samples.length / frameSamples, AudioFpBits + 1)
            if (nFrames < 2) None
            else {
              val e = new Array[Long](nFrames)
              var f = 0
              while (f < nFrames) {
                var sum = 0L
                var t = f * frameSamples
                val end = t + frameSamples
                while (t < end) {
                  val s = samples(t).toLong
                  sum += s * s
                  t += 1
                }
                e(f) = sum
                f += 1
              }
              var fp = 0L
              f = 0
              while (f < nFrames - 1) {
                if (e(f + 1) > e(f)) fp |= 1L << f
                f += 1
              }
              Some(Row(id, fp))
            }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Minimal RIFF/WAVE reader: chunk walk to fmt + data, PCM (format 1)
    * 16-bit mono only; every read bounds-checked. Returns the samples or
    * None for anything else (stereo, float, truncated, non-WAV).
    */
  private def decodeWavPcm16Mono(b: Array[Byte]): Option[Array[Short]] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def tag(i: Int, t: String) =
      b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
        b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    var data: Option[Array[Short]] = None
    while (i + 8 <= b.length && data.isEmpty) {
      val sz = le32(i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (tag(i, "fmt ") && sz >= 16) {
        fmtOk = le16(i + 8) == 1 && le16(i + 10) == 1 && le16(i + 22) == 16
      } else if (tag(i, "data")) {
        if (!fmtOk) return None
        val n = sz / 2
        val out = new Array[Short](n)
        var k = 0
        while (k < n) { out(k) = le16(i + 8 + 2 * k).toShort; k += 1 }
        data = Some(out)
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    data
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

  /** Near-duplicate audio pairs over [[audioFingerprint]] output — the
    * same exact multi-index Hamming engine as [[imageNearDups]].
    */
  def audioNearDups(hashes: DataFrame,
      maxHamming: Int = AudioMaxHamming): DataFrame =
    hammingNearDups(hashes, "afp", maxHamming, AudioFpBits)

  /** Deterministic mono PCM16 WAV whose sample s(t) is the xor-folded mix
    * `m = basisId·2654435761 + t·97003; s = (m ⊕ m≫6 ⊕ m≫13) mod 60001 −
    * 30000` (so |s| ≤ 30500 even with the planted +500 offset — no
    * clamping, which would break the arithmetic mirror). The planted twin
    * shifts the first two frames' samples by +500, moving only frame
    * energies e0/e1 → at most fingerprint bits 0 and 1 differ.
    */
  def syntheticWav(basisId: Long, nSamples: Int,
      perturb: Boolean): Array[Byte] = {
    val dataBytes = nSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataBytes)
    var t = 0
    while (t < nSamples) {
      val m = basisId * 2654435761L + t * 97003L
      var s = ((m ^ (m >> 6) ^ (m >> 13)) % 60001L).toInt - 30000
      if (perturb && t < 2 * AudioFrameSamples) s += 500
      b.putShort(s.toShort)
      t += 1
    }
    b.array()
  }

  /** Audio-corpus fixture, mirroring [[imageFixture]]'s planting scheme:
    * one synthetic WAV of exactly [[AudioFpBits]]+1 frames per document,
    * plus a perturbed twin every [[PlantEvery]]-th document.
    */
  def audioFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val n = (AudioFpBits + 1) * AudioFrameSamples
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
        Row(id, syntheticWav(basis, n, perturb))
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

  // --- video perceptual near-dup: per-keyframe dHash sequence -------------

  val VideoFrameW = 11    // keyframe thumbnail dims = dHash grid directly
  val VideoFrameH = 6     // (a real decoder resizes to this; bits = 10*6)
  val VideoFrames = 6
  val VideoFpBits = (VideoFrameW - 1) * VideoFrameH // 60, sign-safe BIGINT
  val VideoMaxHamming = 11 // TOTAL Hamming budget across aligned frames
  val VideoPerturbY = 2    // planted twin: frames 0-1, x<PerturbX, y<2 →
                           // ≤4 dhash bits/frame, ≤8 total, inside budget

  /** Per-keyframe perceptual fingerprints over a video payload: decode the
    * GVID container (magic + dims + raw grayscale keyframe thumbnails —
    * standing in for the codec+resize step a real deployment runs; the
    * Spark-side plumbing is the real thing), then dHash each frame exactly
    * as [[imageDHash]] does its thumbnail — bit (r,c) set when
    * p(c,r) > p(c+1,r). Output (doc_id, frame, vfp): the frame-aligned
    * fingerprint sequence video dedup compares.
    *
    * Runs in the [[featurize]] mapPartitions shape; payloads that are not
    * well-formed GVID at exactly [[VideoFrameW]]×[[VideoFrameH]] yield no
    * rows. Row blowup is bounded by the frame count.
    */
  def videoFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame", LongType),
      StructField("vfp", LongType)))
    val (w, h) = (VideoFrameW, VideoFrameH)
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        decodeGvid(b, w, h) match {
          case None => Iterator.empty
          case Some(frames) =>
            frames.iterator.zipWithIndex.map { case (px, f) =>
              var hash = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w - 1) {
                  if ((px(y * w + x) & 0xff) > (px(y * w + x + 1) & 0xff))
                    hash |= 1L << (y * (w - 1) + x)
                  x += 1
                }
                y += 1
              }
              Row(id, f.toLong, hash)
            }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Minimal GVID reader: "GVID" magic, LE u16 width/height/frameCount,
    * then frameCount raw row-major gray frames. Bounds-checked; anything
    * malformed or at a different thumbnail size returns None.
    */
  private def decodeGvid(b: Array[Byte], w: Int, h: Int): Option[Seq[Array[Byte]]] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    if (b.length < 10 || b(0) != 'G' || b(1) != 'V' || b(2) != 'I' || b(3) != 'D')
      return None
    val (fw, fh, n) = (le16(4), le16(6), le16(8))
    if (fw != w || fh != h || n < 1 || b.length != 10 + fw * fh * n) return None
    Some((0 until n).map { f =>
      java.util.Arrays.copyOfRange(b, 10 + f * fw * fh, 10 + (f + 1) * fw * fh)
    })
  }

  /** Near-duplicate video pairs: TOTAL Hamming distance over frame-aligned
    * [[videoFingerprint]] sequences ≤ maxHamming — the multi-frame
    * extension of the exact multi-index search: if Σ_f d_f ≤ T over F
    * frames then some frame has d_f ≤ ⌊T/F⌋ (pigeonhole), so banding each
    * frame's hash at that per-frame budget makes the per-(frame, band,
    * key) equi-join generate every qualifying pair — exact recall, never
    * all-pairs, and a skewed key only blows up its own bucket. The verify
    * stage re-joins the two frame sequences (keyed by id, then frame) and
    * sums a codegen'd xor+bit_count per aligned frame.
    */
  def videoNearDups(fps: DataFrame, maxHamming: Int = VideoMaxHamming,
      frames: Int = VideoFrames, bits: Int = VideoFpBits): DataFrame = {
    val perFrame = maxHamming / frames // pigeonhole per-frame budget
    val bands = perFrame + 1
    val bandBits = (bits + bands - 1) / bands
    val mask = (1L << bandBits) - 1
    val f = fps.select(col("doc_id"), col("frame"), col("vfp"))
    val banded = f.select(col("doc_id"), col("frame"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("vfp"), b * bandBits).bitwiseAND(lit(mask))
            .as("key"))): _*)).as("bd"))
      .select(col("doc_id"), col("frame"),
        col("bd.band").as("band"), col("bd.key").as("key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.frame") === col("b.frame") && col("a.band") === col("b.band") &&
          col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    cand.join(f.as("fi"), col("i") === col("fi.doc_id"))
      .join(f.as("fj"),
        col("j") === col("fj.doc_id") && col("fi.frame") === col("fj.frame"))
      .groupBy(col("i"), col("j"))
      .agg(sum(bit_count(col("fi.vfp").bitwiseXOR(col("fj.vfp"))))
        .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic GVID clip whose frame-f pixel (x,y) gray is the
    * xor-folded mix `m = basisId·2654435761 + f·131071 + x·40503 +
    * y·10859; v = (m ⊕ m≫7 ⊕ m≫15) mod 256` — same folding discipline as
    * [[syntheticGrayBmp]] (a linear pixel function would collapse the
    * hashes). The planted twin adds [[PerturbDelta]] (mod 256) on the
    * x<[[PerturbX]], y<[[VideoPerturbY]] corner of the first two frames.
    */
  def syntheticGvid(basisId: Long, perturb: Boolean): Array[Byte] = {
    val (w, h, n) = (VideoFrameW, VideoFrameH, VideoFrames)
    val b = java.nio.ByteBuffer.allocate(10 + w * h * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    b.putShort(w.toShort).putShort(h.toShort).putShort(n.toShort)
    var f = 0
    while (f < n) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val m = basisId * 2654435761L + f * 131071L + x * 40503L + y * 10859L
          var v = ((m ^ (m >> 7) ^ (m >> 15)) % 256).toInt
          if (perturb && f < 2 && x < PerturbX && y < VideoPerturbY)
            v = (v + PerturbDelta.toInt) % 256
          b.put(v.toByte)
          x += 1
        }
        y += 1
      }
      f += 1
    }
    b.array()
  }

  /** Video-corpus fixture, mirroring [[imageFixture]]'s planting scheme:
    * one synthetic clip per document plus a perturbed twin every
    * [[PlantEvery]]-th document.
    */
  def videoFixture(docs: DataFrame): DataFrame = {
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
        Row(id, syntheticGvid(basis, perturb))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
