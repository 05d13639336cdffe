package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pprof binary ingest (`/ingest`, `writer/utils/unmarshal/go_pprof.go:82-235`):
  * gzip-framed protobuf `Profile` messages. Like the remote-write decoder,
  * this reads the public protobuf wire format directly — the subset of
  * profile.proto the reference consumes:
  *
  * {{{
  * Profile { repeated ValueType sample_type = 1; repeated Sample sample = 2;
  *           repeated Location location = 4; repeated Function function = 5;
  *           repeated string string_table = 6; }
  * Sample   { repeated uint64 location_id = 1 [packed]; repeated int64 value = 2 [packed]; }
  * Location { uint64 id = 1; repeated Line line = 4; }
  * Line     { uint64 function_id = 1; }
  * Function { uint64 id = 1; int64 name = 2; }  // name = string_table index
  * }}}
  *
  * Samples land as (stack: Array[fn name] root→leaf, value) rows; pprof
  * MERGE across profiles is then a groupBy on the stack (SURVEY §2.F).
  */
object Pprof {

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

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

  private def packedVarints(b: Array[Byte], from: Int, to: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var p = from
    while (p < to) { val (v, p2) = readVarint(b, p); out += v; p = p2 }
    out.toSeq
  }

  /** Skip any field given its tag's wire type. Returns pos after field. */
  private def skip(b: Array[Byte], tag: Long, pos: Int): Int = (tag & 7) match {
    case 0 => readVarint(b, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p2) = readVarint(b, pos); p2 + len.toInt
    case 5 => pos + 4
  }

  /** One gzip'd Profile → (stack of fn names root→leaf, sample value)
    * pairs (first value series).
    */
  def parseProfile(gzipped: Array[Byte]): Seq[(Seq[String], Long)] = {
    val b = gunzip(gzipped)
    val strings = scala.collection.mutable.ArrayBuffer[String]()
    val locToFn = scala.collection.mutable.Map[Long, Long]() // loc id → fn id
    val fnToName = scala.collection.mutable.Map[Long, Long]() // fn id → strtab idx
    val samples = scala.collection.mutable.ArrayBuffer[(Seq[Long], Long)]()

    var p = 0
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      (tag >> 3) match {
        case 2 => // Sample
          val (len, p2) = readVarint(b, p1); val end = p2 + len.toInt
          var q = p2
          var locs: Seq[Long] = Nil
          var value = 0L
          while (q < end) {
            val (ftag, q1) = readVarint(b, q)
            (ftag >> 3, ftag & 7) match {
              case (1, 2) => val (l, q2) = readVarint(b, q1)
                locs = packedVarints(b, q2, q2 + l.toInt); q = q2 + l.toInt
              case (1, 0) => val (v, q2) = readVarint(b, q1)
                locs = locs :+ v; q = q2
              case (2, 2) => val (l, q2) = readVarint(b, q1)
                value = packedVarints(b, q2, q2 + l.toInt).headOption.getOrElse(0L)
                q = q2 + l.toInt
              case (2, 0) => val (v, q2) = readVarint(b, q1)
                if (value == 0L) value = v
                q = q2
              case _ => q = skip(b, ftag, q1)
            }
          }
          samples += ((locs, value)); p = end
        case 4 => // Location
          val (len, p2) = readVarint(b, p1); val end = p2 + len.toInt
          var q = p2; var id = 0L; var fnId = 0L
          while (q < end) {
            val (ftag, q1) = readVarint(b, q)
            (ftag >> 3, ftag & 7) match {
              case (1, 0) => val (v, q2) = readVarint(b, q1); id = v; q = q2
              case (4, 2) => // Line
                val (l, q2) = readVarint(b, q1); val lend = q2 + l.toInt
                var r = q2
                while (r < lend) {
                  val (ltag, r1) = readVarint(b, r)
                  if ((ltag >> 3) == 1) { val (v, r2) = readVarint(b, r1); fnId = v; r = r2 }
                  else r = skip(b, ltag, r1)
                }
                q = lend
              case _ => q = skip(b, ftag, q1)
            }
          }
          locToFn(id) = fnId; p = end
        case 5 => // Function
          val (len, p2) = readVarint(b, p1); val end = p2 + len.toInt
          var q = p2; var id = 0L; var nameIdx = 0L
          while (q < end) {
            val (ftag, q1) = readVarint(b, q)
            (ftag >> 3, ftag & 7) match {
              case (1, 0) => val (v, q2) = readVarint(b, q1); id = v; q = q2
              case (2, 0) => val (v, q2) = readVarint(b, q1); nameIdx = v; q = q2
              case _ => q = skip(b, ftag, q1)
            }
          }
          fnToName(id) = nameIdx; p = end
        case 6 => // string_table entry
          val (len, p2) = readVarint(b, p1)
          strings += new String(b, p2, len.toInt, "UTF-8")
          p = p2 + len.toInt
        case _ => p = skip(b, tag, p1)
      }
    }
    // pprof stacks are leaf-first; emit root→leaf
    samples.toSeq.map { case (locs, v) =>
      (locs.reverse.map(l => strings(fnToName(locToFn(l)).toInt)), v)
    }
  }

  private val rowSchema = StructType(Seq(
    StructField("stack", ArrayType(StringType)),
    StructField("value", LongType)))

  /** Decode gzip'd pprof bodies (binary `body` column) → stack rows. */
  def decode(bodies: DataFrame): DataFrame = {
    val spark = bodies.sparkSession
    val rdd = bodies.select(col("body")).rdd.mapPartitions { it =>
      it.flatMap { r =>
        parseProfile(r.getAs[Array[Byte]](0)).map { case (stack, v) =>
          Row(stack, v)
        }
      }
    }
    spark.createDataFrame(rdd, rowSchema)
  }

  /** pprof MERGE: sum sample values per identical stack across profiles
    * (`prof_merge_v2.go:51-200` semantics as a groupBy).
    */
  def merge(decoded: DataFrame): DataFrame =
    decoded.groupBy(col("stack"))
      .agg(sum(col("value")).as("value"), count(lit(1)).as("samples"))

  // --- encode (client side of the round trip) -----------------------------

  /** Build a gzip'd Profile from (stack root→leaf, value) pairs. */
  def encodeProfile(rows: Seq[(Seq[String], Long)]): Array[Byte] = {
    import PromRemoteWriteWire._
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def strIdx(s: String): Int =
      strings.getOrElseUpdate(s, strings.size)
    val fnIds = scala.collection.mutable.LinkedHashMap[String, Long]()
    def fnId(name: String): Long = fnIds.getOrElseUpdate(name, { strIdx(name); fnIds.size + 1L })
    rows.foreach(_._1.foreach(fnId))

    val out = new ByteArrayOutputStream()
    // samples (leaf-first location ids; location id == function id here)
    rows.foreach { case (stack, v) =>
      val s = new ByteArrayOutputStream()
      val locs = new ByteArrayOutputStream()
      stack.reverse.foreach(fn => writeVarint(locs, fnId(fn)))
      writeLenDelim(s, 1, locs.toByteArray)
      val vals = new ByteArrayOutputStream()
      writeVarint(vals, v)
      writeLenDelim(s, 2, vals.toByteArray)
      writeLenDelim(out, 2, s.toByteArray)
    }
    // locations
    fnIds.values.foreach { id =>
      val loc = new ByteArrayOutputStream()
      writeVarint(loc, (1 << 3) | 0); writeVarint(loc, id)
      val line = new ByteArrayOutputStream()
      writeVarint(line, (1 << 3) | 0); writeVarint(line, id)
      writeLenDelim(loc, 4, line.toByteArray)
      writeLenDelim(out, 4, loc.toByteArray)
    }
    // functions
    fnIds.foreach { case (name, id) =>
      val fn = new ByteArrayOutputStream()
      writeVarint(fn, (1 << 3) | 0); writeVarint(fn, id)
      writeVarint(fn, (2 << 3) | 0); writeVarint(fn, strings(name))
      writeLenDelim(out, 5, fn.toByteArray)
    }
    // string table (index order)
    strings.keys.foreach(s => writeLenDelim(out, 6, s.getBytes("UTF-8")))
    gzip(out.toByteArray)
  }
}

/** Shared wire-writer primitives (also used by PromRemoteWrite). */
object PromRemoteWriteWire {
  def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  def writeLenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, payload.length)
    out.write(payload)
  }
}
