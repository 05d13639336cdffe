package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Testdata-schema canary (round-9 verdict ask #3): the driver regenerates
  * `/root/testdata` between rounds and has already changed the events
  * timestamp encoding once (ns → µs, which silently darkened 160 gates).
  * These tests make the NEXT generator drift fail one named test instead of
  * 77: every canonical derivation must analyze + produce a row against the
  * real testdata, and the events reader must accept every plausible parquet
  * timestamp encoding with identical results, independent of the session
  * timezone (verdict ask #4 — the µs/NTZ path must never cast through the
  * session zone).
  */
class TestdataCanarySpec extends SparkSpec {

  test("canary: every canonical table derives from driver testdata") {
    val tables: Seq[(String, () => DataFrame)] = Seq(
      "events"      -> (() => Tables.events(spark, sf)),
      "logs"        -> (() => Tables.logs(spark, sf)),
      "spans"       -> (() => Tables.spans(spark, sf)),
      "spanAttrs"   -> (() => Tables.spanAttrs(spark, sf)),
      "gauge"       -> (() => Tables.gaugeSamples(spark, sf)),
      "counter"     -> (() => Tables.counterSamples(spark, sf)),
      "bucket"      -> (() => Tables.bucketSamples(spark, sf)),
      "metrics15s"  -> (() => Tables.metrics15s(spark, sf)),
      "documents"   -> (() => Tables.documents(spark, sf)),
      "embeddings"  -> (() => Tables.embeddings(spark, sf)))
    tables.foreach { case (name, f) =>
      // .schema forces full analysis (where the r9 breakage surfaced);
      // limit(1).count forces one real batch through the reader
      val df = f()
      assert(df.schema.fieldNames.nonEmpty, s"$name: empty schema")
      assert(df.limit(1).count() == 1L, s"$name: no rows from testdata")
    }
    assert(Tables.events(spark, sf).schema("ts").dataType == LongType,
      "canonical events.ts must normalize to epoch-ns long")
  }

  test("canary: events reader is timestamp-unit robust (ns-long/µs/ms/NTZ)") {
    val root = "target/canary-events"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root))
    // truncate to ms so the MILLIS variant round-trips losslessly and all
    // variants share one expected checksum
    val base = Tables.events(spark, sf)
      .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000000L)))
    def checksum(df: DataFrame): (BigDecimal, Long, Long, Long) = {
      val r = df.agg(sum(col("ts").cast("decimal(38,0)")), count(lit(1)),
        min(col("ts")), max(col("ts"))).collect()(0)
      (BigDecimal(r.getDecimal(0)), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val expected = checksum(base)
    val asMicros = base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // four encodings a generator could plausibly emit next
    base.write.mode("overwrite").parquet(s"$root/long/events.parquet")
    Seq("us_instant" -> "TIMESTAMP_MICROS", "ms_instant" -> "TIMESTAMP_MILLIS")
      .foreach { case (name, outType) =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", outType)
        try asMicros.write.mode("overwrite").parquet(s"$root/$name/events.parquet")
        finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    asMicros.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$root/ntz_us/events.parquet")
    Seq("long", "us_instant", "ms_instant", "ntz_us").foreach { v =>
      assert(checksum(Tables.events(spark, s"$root/$v")) == expected,
        s"variant $v: events normalization changed values")
    }
    // tz-independence (ask #4): the NTZ arm must not shift with the session
    // zone — Pacific/Kiritimati (UTC+14 now, -10:40 in 1970) is the worst
    // case for any conversion that casts through the session timezone
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try {
      assert(checksum(Tables.events(spark, s"$root/ntz_us")) == expected,
        "NTZ events path is session-timezone dependent")
      assert(checksum(Tables.events(spark, sf).withColumn(
        "ts", col("ts") - pmod(col("ts"), lit(1000000L)))) == expected,
        "real testdata events path is session-timezone dependent")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
