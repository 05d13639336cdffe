package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** OTLP profiles signal (pprofile) ingest.
  *
  * The wire shape is the OTLP development profile proto the reference
  * decodes in `writer/utils/unmarshal/otlp_profile.go:1-458`: an export
  * carries a shared DICTIONARY (string/function/location/stack tables) and
  * per-profile samples that reference stacks by index; the reference
  * re-slices the dictionary per profile and stores the payload. Here the
  * decode is a declarative chain of `element_at` index resolutions over the
  * parsed dictionary arrays — sample → stack → locations → functions →
  * strings — so Catalyst runs it inside one codegen stage per batch; no
  * driver-side graph walk.
  *
  * Output rows match the pprof ingest shape (`Pprof.decode`):
  * (service_name, timestamp_ns, stack Array[String] root-first, value).
  */
object OtlpProfiles {

  private val schema: DataType = DataType.fromDDL(
    """resourceProfiles array<struct<
      |  resource struct<attributes array<struct<
      |    key string, value struct<stringValue string>>>>,
      |  scopeProfiles array<struct<profiles array<struct<
      |    timeNanos string,
      |    sampleType struct<typeStrindex int, unitStrindex int>,
      |    samples array<struct<stackIndex int, values array<bigint>>>
      |  >>>>
      |>>,
      |dictionary struct<
      |  stringTable array<string>,
      |  functionTable array<struct<nameStrindex int>>,
      |  locationTable array<struct<functionIndex int>>,
      |  stackTable array<struct<locationIndices array<int>>>
      |>""".stripMargin)

  /** Resolve one location index to its function name via the dictionary
    * chain (all OTLP table indices are 0-based; element_at is 1-based).
    */
  private def fnName(dict: Column, li: Column): Column =
    element_at(dict.getField("stringTable"),
      element_at(dict.getField("functionTable"),
        element_at(dict.getField("locationTable"), li + 1)
          .getField("functionIndex") + 1)
        .getField("nameStrindex") + 1)

  /** Decode OTLP profile export JSON bodies (one per row in `body`) into
    * flattened stack rows.
    */
  def decode(bodies: DataFrame): DataFrame = {
    val parsed = bodies.select(from_json(col("body"), schema).as("r"))
    val svc = filter(col("rp.resource.attributes"),
      a => a.getField("key") === "service.name")
    parsed
      .select(explode(col("r.resourceProfiles")).as("rp"),
        col("r.dictionary").as("dict"))
      .select(col("dict"),
        element_at(svc, 1).getField("value").getField("stringValue")
          .as("service_name"),
        explode(col("rp.scopeProfiles")).as("sp"))
      .select(col("dict"), col("service_name"),
        explode(col("sp.profiles")).as("p"))
      .select(col("dict"), col("service_name"),
        col("p.timeNanos").cast("long").as("timestamp_ns"),
        explode(col("p.samples")).as("s"))
      .select(col("service_name"), col("timestamp_ns"),
        transform(
          element_at(col("dict.stackTable"), col("s.stackIndex") + 1)
            .getField("locationIndices"),
          li => fnName(col("dict"), li)).as("stack"),
        element_at(col("s.values"), 1).as("value"))
  }

  /** Deterministic fixture encoder: one export for one service with a
    * shared dictionary (strings interned in first-appearance order, one
    * function+location per name, one stack per distinct frame list) —
    * the dictionary-building mirror of the decoder above.
    */
  def encode(service: String, timeNanos: Long,
      samples: Seq[(Seq[String], Long)]): String = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def intern(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    val fns = scala.collection.mutable.LinkedHashMap[String, Int]()
    def fnIdx(name: String): Int = {
      intern(name)
      fns.getOrElseUpdate(name, fns.size)
    }
    val stacks = scala.collection.mutable.LinkedHashMap[Seq[String], Int]()
    val sampleJson = samples.map { case (stack, v) =>
      stack.foreach(fnIdx)
      val si = stacks.getOrElseUpdate(stack, stacks.size)
      s"""{"stackIndex":$si,"values":[$v]}"""
    }
    intern("cpu"); intern("nanoseconds")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val stringTable = strings.keys.map(jstr).mkString("[", ",", "]")
    val functionTable = fns.keys
      .map(n => s"""{"nameStrindex":${strings(n)}}""").mkString("[", ",", "]")
    // one location per function, same order → locationTable[i].functionIndex = i
    val locationTable = fns.values
      .map(i => s"""{"functionIndex":$i}""").mkString("[", ",", "]")
    val stackTable = stacks.keys
      .map(st => st.map(fns).mkString("""{"locationIndices":[""", ",", "]}"))
      .mkString("[", ",", "]")
    s"""{"resourceProfiles":[{"resource":{"attributes":[
       |{"key":"service.name","value":{"stringValue":${jstr(service)}}}]},
       |"scopeProfiles":[{"profiles":[{
       |"timeNanos":"$timeNanos",
       |"sampleType":{"typeStrindex":${strings("cpu")},"unitStrindex":${strings("nanoseconds")}},
       |"samples":[${sampleJson.mkString(",")}]}]}]}],
       |"dictionary":{"stringTable":$stringTable,
       |"functionTable":$functionTable,
       |"locationTable":$locationTable,
       |"stackTable":$stackTable}}""".stripMargin.replace("\n", "")
  }
}
