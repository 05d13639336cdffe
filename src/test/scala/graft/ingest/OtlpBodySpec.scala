package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OTLP log-body sanitization (`otlplogs.go:108-145` SanitizeValue; the
  * reference's own otlplogs_test.go covers kvlist and string bodies):
  * scalar bodies render Go-style, kvlist bodies serialize as a JSON object
  * with sorted keys, array bodies as a JSON array.
  */
class OtlpBodySpec extends SparkSpec {

  private def lineOf(bodyJson: String): String = {
    val s = spark
    import s.implicits._
    val req =
      s"""{"resourceLogs":[{"scopeLogs":[{"logRecords":[
         |{"timeUnixNano":"1704067200000000000","body":$bodyJson}]}]}]}"""
        .stripMargin.replace("\n", "")
    WireFormats.decodeOtlpLogs(Seq(req).toDF("body"))
      .select(col("line")).collect()(0).getString(0)
  }

  test("string / int / double / bool bodies render Go-style") {
    assert(lineOf("""{"stringValue":"hello world"}""") == "hello world")
    assert(lineOf("""{"intValue":"42"}""") == "42")
    assert(lineOf("""{"doubleValue":3.5}""") == "3.5")
    assert(lineOf("""{"doubleValue":3.0}""") == "3") // FormatFloat 'f' -1
    assert(lineOf("""{"boolValue":true}""") == "true")
  }

  test("kvlist body serializes as a sorted-key JSON object") {
    val line = lineOf(
      """{"kvlistValue":{"values":[
        |{"key":"zeta","value":{"stringValue":"z"}},
        |{"key":"alpha","value":{"intValue":"1"}},
        |{"key":"mid","value":{"boolValue":false}}]}}"""
        .stripMargin.replace("\n", ""))
    assert(line == """{"alpha":"1","mid":"false","zeta":"z"}""")
  }

  test("array body serializes as a JSON array of rendered leaves") {
    val line = lineOf(
      """{"arrayValue":{"values":[
        |{"stringValue":"a"},{"intValue":"7"},{"doubleValue":2.5}]}}"""
        .stripMargin.replace("\n", ""))
    assert(line == """["a","7","2.5"]""")
  }

  test("influx precision param scales timestamps to ns; invalid rejected") {
    val s = spark
    import s.implicits._
    val lines = Seq("cpu,host=a usage=0.5 1704067200000").toDF("line")
    val ms = WireFormats.decodeInflux(lines, "ms")
      .select(col("timestamp_ns")).collect()(0).getLong(0)
    assert(ms == 1704067200000L * 1000000L)
    val ns = WireFormats.decodeInflux(
      Seq("cpu,host=a usage=0.5 1704067200000000000").toDF("line"))
      .select(col("timestamp_ns")).collect()(0).getLong(0)
    assert(ns == 1704067200000000000L)
    intercept[IllegalArgumentException] {
      WireFormats.decodeInflux(lines, "m")
    }
  }

  test("double bodies render plain decimal, never scientific (FormatFloat 'f' -1)") {
    assert(lineOf("""{"doubleValue":1.0E-7}""") == "0.0000001")
    assert(lineOf("""{"doubleValue":12345678.5}""") == "12345678.5")
    assert(lineOf("""{"doubleValue":1e15}""") == "1000000000000000")
    assert(lineOf("""{"doubleValue":0.30000000000000004}""") == "0.30000000000000004")
  }

  test("bytes bodies pass through as base64 (SanitizeValue)") {
    assert(lineOf("""{"bytesValue":"aGVsbG8="}""") == "aGVsbG8=")
  }

  test("kvlist keys sanitize (SanitizeKey) before the sorted-JSON render") {
    val line = lineOf(
      """{"kvlistValue":{"values":[
        |{"key":"a.b","value":{"stringValue":"x"}},
        |{"key":"2fast","value":{"intValue":"1"}}]}}"""
        .stripMargin.replace("\n", ""))
    assert(line == """{"_2fast":"1","a_b":"x"}""")
  }

  test("log label keys sanitize; record attrs still win over resource attrs") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceLogs":[{"resource":{"attributes":[
        |{"key":"service.name","value":{"stringValue":"api"}}]},
        |"scopeLogs":[{"logRecords":[{"timeUnixNano":"1",
        |"body":{"stringValue":"x"},
        |"attributes":[{"key":"service.name","value":{"stringValue":"rec"}}]}]}]}]}"""
        .stripMargin.replace("\n", "")
    val labels = WireFormats.decodeOtlpLogs(Seq(req).toDF("body"))
      .select(col("labels")).collect()(0).getMap[String, String](0)
    assert(labels("service_name") == "rec")
    assert(!labels.contains("service.name"))
  }

  test("scope attrs, trace/span id overrides, observed-ts fallback") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceLogs":[{"resource":{"attributes":[
        |{"key":"a","value":{"stringValue":"res"}}]},
        |"scopeLogs":[{"scope":{"attributes":[
        |{"key":"a","value":{"stringValue":"scope"}},
        |{"key":"lib","value":{"stringValue":"sdk"}}]},
        |"logRecords":[{"observedTimeUnixNano":"777",
        |"traceId":"0AF7651916CD43DD8448EB211C80319C","spanId":"b7ad6b7169203331",
        |"body":{"stringValue":"x"},
        |"attributes":[{"key":"trace_id","value":{"stringValue":"attr-ignored"}}]}]}]}]}"""
        .stripMargin.replace("\n", "")
    val row = WireFormats.decodeOtlpLogs(Seq(req).toDF("body"))
      .select(col("labels"), col("timestamp_ns")).collect()(0)
    val labels = row.getMap[String, String](0)
    assert(labels("a") == "scope")  // scope wins over resource
    assert(labels("lib") == "sdk")
    // first-class ids override the same-named attribute, lowercased hex
    assert(labels("trace_id") == "0af7651916cd43dd8448eb211c80319c")
    assert(labels("span_id") == "b7ad6b7169203331")
    assert(row.getLong(1) == 777L)  // timeUnixNano absent → observed
  }

  test("trace decode: resource merge, service-name chain, status/kind attrs") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceSpans":[{"resource":{"attributes":[
        |{"key":"service.name","value":{"stringValue":"api"}},
        |{"key":"region","value":{"stringValue":"us"}}]},
        |"scopeSpans":[{"spans":[
        |{"traceId":"t1","spanId":"s1","name":"op","kind":"2",
        |"startTimeUnixNano":"100","endTimeUnixNano":"350",
        |"attributes":[
        |{"key":"peer.service","value":{"stringValue":"downstream"}},
        |{"key":"region","value":{"stringValue":"eu"}}],
        |"status":{"code":"STATUS_CODE_ERROR"}},
        |{"traceId":"t1","spanId":"s2","name":"op2",
        |"startTimeUnixNano":"10","endTimeUnixNano":"20","attributes":[]}
        |]}]},
        |{"resource":{"attributes":[]},"scopeSpans":[{"spans":[
        |{"traceId":"t2","spanId":"s3","name":"op3",
        |"startTimeUnixNano":"10","endTimeUnixNano":"20","attributes":[]}
        |]}]}]}""".stripMargin.replace("\n", "")
    val rows = WireFormats.decodeOtlpTraces(Seq(req).toDF("body"))
      .select(col("span_id_hex"), col("service_name"), col("attrs"),
        col("duration_ns"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a1 = rows("s1").getMap[String, String](2)
    // resource attr wins the attrs-map merge (resource attrs are appended
    // AFTER span attrs and Go map assignment last-wins, otlp.go:81,154-160);
    // service.name kept from the resource (the chain only fills ABSENT
    // keys), local chain prefers peer.service only when service.name is
    // absent from the span-first occurrence order
    assert(a1("region") == "us")
    assert(rows("s1").getString(1) == "api")
    assert(a1("status") == "error")
    assert(a1("kind") == "server")
    assert(a1("remoteService.name") == "api")
    assert(rows("s1").getLong(3) == 250L)
    // a bare span still inherits the RESOURCE's service.name via the merge
    val a2 = rows("s2").getMap[String, String](2)
    assert(rows("s2").getString(1) == "api")
    assert(a2("status") == "unset")
    assert(a2("kind") == "internal")
    assert(a2("name") == "op2")
    // no service attrs anywhere → sentinel local name
    assert(rows("s3").getString(1) == "OTLPResourceNoServiceName")
  }

  test("zipkin decode: string timestamps, endpoints, kind, otel status tag") {
    val s = spark
    import s.implicits._
    val body =
      """[{"traceId":"0af7651916cd43dd8448eb211c80319c","id":"b7ad6b7169203331",
        |"name":"get","kind":"SERVER","timestamp":"1608239395286533","duration":100000,
        |"localEndpoint":{"serviceName":"front"},
        |"remoteEndpoint":{"serviceName":"back"},
        |"tags":{"http.method":"GET","otel.status_code":"ERROR"}}]"""
        .stripMargin.replace("\n", "")
    val r = WireFormats.decodeZipkin(Seq(body).toDF("body"))
      .select(col("service_name"), col("timestamp_ns"), col("duration_ns"),
        col("tags")).collect()(0)
    // remote endpoint overwrites an already-set local one (reference quirk)
    assert(r.getString(0) == "back")
    assert(r.getLong(1) == 1608239395286533000L) // string µs → ns
    assert(r.getLong(2) == 100000000L)
    val tags = r.getMap[String, String](3)
    assert(tags("kind") == "server")
    assert(tags("name") == "get")
    assert(tags("local_endpoint_service_name") == "front")
    assert(tags("remote_endpoint_service_name") == "back")
    assert(tags("service.name") == "back")
    assert(tags("status") == "error")
    assert(tags("http.method") == "GET")
  }

  test("datadog tag pattern and label assembly; elastic bulk action kinds") {
    val s = spark
    import s.implicits._
    val dd =
      """[{"message":"m1","ddtags":"env:prod:x,9bad:skip,ok:a.b/c","service":"svc",
        |"source_type":"agent","timestamp":1700000000123}]"""
        .stripMargin.replace("\n", "")
    val row = WireFormats.decodeDatadogLogs(Seq(dd).toDF("body"))
      .select(col("labels"), col("timestamp_ns")).collect()(0)
    val labels = row.getMap[String, String](0)
    assert(labels("env") == "prod:x")    // values may contain colons
    assert(!labels.contains("9bad"))     // keys must start with a letter
    assert(labels("ok") == "a.b/c")
    assert(labels("type") == "datadog")
    assert(labels("source_type") == "agent")
    assert(row.getLong(1) == 1700000000123L * 1000000L)

    val bulk = Seq(
      """{"index":{"_index":"logs","_id":"7"}}""",
      """{"msg":"doc1"}""",
      """{"create":{"_index":"logs2"}}""",
      """{"msg":"doc2"}""",
      """{"delete":{"_index":"logs","_id":"9"}}""",
      """{"update":{"_index":"logs","_id":"9"}}""",
      """{"doc":{"msg":"update-doc-skipped"}}""").mkString("\n")
    val rows = WireFormats.decodeElasticBulk(Seq(bulk).toDF("body"))
      .select(col("labels"), col("line")).collect()
    assert(rows.length == 2)
    val l1 = rows.map(r => r.getString(1) -> r.getMap[String, String](0)).toMap
    assert(l1("""{"msg":"doc1"}""")("_index") == "logs")
    assert(l1("""{"msg":"doc1"}""")("_id") == "7")
    assert(l1("""{"msg":"doc1"}""")("type") == "elastic")
    assert(l1("""{"msg":"doc2"}""")("_index") == "logs2")
  }

  test("native OTLP sanitize family equals the composed-HOF spec forms") {
    val s = spark
    import s.implicits._
    // attr arrays hitting every rendering branch: scalar kinds, doubles in
    // each goFloatStr band, JSON-escaping edges (quotes, backslash,
    // control chars incl. named \t\n and \u-form , non-ASCII),
    // kvlist (sorted sanitized keys, collide-after-sanitize last-wins),
    // arrays, nesting past the depth bound, keys needing sanitization
    val attrCases = Seq(
      """[{"key":"s","value":{"stringValue":"plain"}},
        |{"key":"esc","value":{"stringValue":"q\" b\\ t\t n\n ctlCTRLCH uUNICH"}},
        |{"key":"i","value":{"intValue":"42"}},
        |{"key":"b","value":{"boolValue":false}},
        |{"key":"by","value":{"bytesValue":"aGk="}},
        |{"key":"d1","value":{"doubleValue":3.0}},
        |{"key":"d2","value":{"doubleValue":2.5}},
        |{"key":"d3","value":{"doubleValue":0.1}},
        |{"key":"d4","value":{"doubleValue":1e21}},
        |{"key":"d5","value":{"doubleValue":5e-20}},
        |{"key":"d6","value":{"doubleValue":-1.5e21}},
        |{"key":"d7","value":{"doubleValue":-0.125}},
        |{"key":"d8","value":{"doubleValue":12345678901234567890.5}},
        |{"key":"d9","value":{"doubleValue":1.0000000000000002}}]""",
      """[{"key":"9bad key!","value":{"stringValue":"x"}},
        |{"key":"","value":{"stringValue":"empty"}},
        |{"key":"ключ","value":{"stringValue":"cyr"}},
        |{"key":"a.b","value":{"stringValue":"first"}},
        |{"key":"a:b","value":{"stringValue":"second"}},
        |{"key":"deploy","value":{"kvlistValue":{"values":[
        |{"key":"zeta","value":{"stringValue":"z\"q"}},
        |{"key":"a.x","value":{"intValue":"1"}},
        |{"key":"a:x","value":{"intValue":"2"}},
        |{"key":"nest","value":{"kvlistValue":{"values":[
        |{"key":"in","value":{"arrayValue":{"values":[
        |{"doubleValue":0.5},{"kvlistValue":{"values":[
        |{"key":"gone","value":{"stringValue":"past-bound"}}]}}]}}}]}}}]}}},
        |{"key":"arr","value":{"arrayValue":{"values":[
        |{"stringValue":"x\ty"},{"boolValue":true}]}}},
        |{"key":"novalue"}]""",
      """[]""").map(_.stripMargin
        .replace("CTRLCH", "\\" + "u0001")
        .replace("UNICH", "\\" + "u00e9" + "\\" + "u20ac"))
    val reqs = attrCases.map(a =>
      s"""{"resourceLogs":[{"resource":{"attributes":${a.replace("\n", "")}},
         |"scopeLogs":[{"logRecords":[{"timeUnixNano":"1",
         |"body":{"kvlistValue":{"values":[
         |{"key":"inner","value":${"""{"arrayValue":{"values":[{"doubleValue":0.1},{"stringValue":"s"}]}}"""}}]}}}]}]}]}"""
        .stripMargin.replace("\n", ""))
    val parsed = reqs.toDF("body")
      .select(explode(from_json(col("body"), WireFormats.otlpLogsSchema)
        .getField("resourceLogs")).as("rl"))
      .select(col("rl.resource.attributes").as("ra"),
        explode(col("rl.scopeLogs")).as("sl"))
      .select(col("ra"), explode(col("sl.logRecords")).as("r"))
      .select(col("ra"), col("r.body").as("bd"))
    val both = parsed.select(
      to_json(graft.functions.OtlpSanitize.sanitizedAttrs(col("ra"))).as("ns"),
      to_json(WireFormats.attrsToMapSanitizedSpec(col("ra"))).as("ss"),
      to_json(graft.functions.OtlpSanitize.plainAttrs(col("ra"))).as("np"),
      to_json(WireFormats.attrsToMapSpec(col("ra"))).as("sp"),
      coalesce(graft.functions.OtlpSanitize.anyValueStr(col("bd")), lit(""))
        .as("nb"),
      WireFormats.bodyStrSpec(col("bd")).as("sb")).collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"sanitized: $r")
      assert(r.getString(2) == r.getString(3), s"plain: $r")
      assert(r.getString(4) == r.getString(5), s"body: $r")
    }
    // spot-check the values are the expected renderings, not two copies
    // of the same wrong answer (order-independent: collect order is not
    // the input order)
    val allSan = both.map(_.getString(0)).mkString("\n")
    assert(allSan.contains(""""d3":"0.1""""))
    assert(allSan.contains(""""d4":"1000000000000000000000""""))
    assert(allSan.contains(""""d5":"0.00000000000000000005""""))
    assert(allSan.contains(""""d1":"3""""))
    assert(allSan.contains(""""_9bad_key_":"x""""))
    assert(allSan.contains(""""a_b":"second"""")) // last-wins post-sanitize
    assert(!allSan.contains("past-bound"))
    assert(both.map(_.getString(4)).exists(_.startsWith("""{"inner":"[\"0.1\",""")))
  }

  test("native DatadogTagsParse equals the composed-HOF spec form") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "env:prod,team:sre", "env:a,env:b", "env:prod:x,9bad:skip,ok:a.b/c",
      "", ",", "noval,:nokey,k:", "a:1,,b:2,", "Ärger:umlaut-Ök",
      "path:/var/log\\x,tail:a:b:c", "UPPER:CASE", "k-1.2/3:v-4.5/6:7",
      null)
    val df = cases.toDF("t")
    val both = df.select(
      to_json(graft.functions.DatadogTags.parse(coalesce(col("t"), lit(""))))
        .as("n"),
      to_json(WireFormats.datadogTagsSpec(col("t"))).as("s")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("missing / unsupported body renders as empty string") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceLogs":[{"scopeLogs":[{"logRecords":[
        |{"timeUnixNano":"1704067200000000000"}]}]}]}"""
        .stripMargin.replace("\n", "")
    val line = WireFormats.decodeOtlpLogs(Seq(req).toDF("body"))
      .select(col("line")).collect()(0).getString(0)
    assert(line == "")
  }

  test("nested kvlist/array bodies render recursively (SanitizeValue)") {
    // kvlist-in-kvlist: the inner map renders to a JSON string, which the
    // outer json.Marshal escapes (otlplogs.go:136-141 recursion)
    val line = lineOf(
      """{"kvlistValue":{"values":[
        |{"key":"nest","value":{"kvlistValue":{"values":[
        |{"key":"a","value":{"intValue":"1"}}]}}},
        |{"key":"top","value":{"stringValue":"t"}}]}}"""
        .stripMargin.replace("\n", ""))
    assert(line == """{"nest":"{\"a\":\"1\"}","top":"t"}""")
    // array-in-array: inner renders to "[...]" and is escaped as a string
    val arr = lineOf(
      """{"arrayValue":{"values":[
        |{"arrayValue":{"values":[{"intValue":"1"},{"intValue":"2"}]}},
        |{"stringValue":"x"}]}}"""
        .stripMargin.replace("\n", ""))
    assert(arr == """["[\"1\",\"2\"]","x"]""")
  }

  test("kvlist keys that collide after sanitization dedupe last-wins") {
    // "a.b" and "a:b" both sanitize to "a_b" — Go map assignment keeps the
    // last; map_from_entries would have thrown DUPLICATED_MAP_KEY
    val line = lineOf(
      """{"kvlistValue":{"values":[
        |{"key":"a.b","value":{"stringValue":"first"}},
        |{"key":"a:b","value":{"stringValue":"second"}}]}}"""
        .stripMargin.replace("\n", ""))
    assert(line == """{"a_b":"second"}""")
  }

  test("nested kvlist ATTRIBUTE values render as JSON strings in labels") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceLogs":[{"resource":{"attributes":[
        |{"key":"deploy","value":{"kvlistValue":{"values":[
        |{"key":"zone","value":{"stringValue":"eu"}},
        |{"key":"az","value":{"intValue":"2"}}]}}}]},
        |"scopeLogs":[{"logRecords":[{"timeUnixNano":"1",
        |"body":{"stringValue":"x"}}]}]}]}"""
        .stripMargin.replace("\n", "")
    val labels = WireFormats.decodeOtlpLogs(Seq(req).toDF("body"))
      .select(col("labels")).collect()(0).getMap[String, String](0)
    assert(labels("deploy") == """{"az":"2","zone":"eu"}""")
  }

  test("extreme doubles render plain decimal per FormatFloat 'f' -1") {
    assert(lineOf("""{"doubleValue":1e21}""") == "1000000000000000000000")
    assert(lineOf("""{"doubleValue":1.5e21}""") == "1500000000000000000000")
    assert(lineOf("""{"doubleValue":5e-20}""") == "0.00000000000000000005")
    assert(lineOf("""{"doubleValue":-2.5e-19}""") == "-0.00000000000000000025")
  }

  test("trace attrs flatten nested kvlist/array with dotted keys") {
    val s = spark
    import s.implicits._
    val req =
      """{"resourceSpans":[{"resource":{"attributes":[
        |{"key":"env","value":{"kvlistValue":{"values":[
        |{"key":"region","value":{"stringValue":"eu"}}]}}}]},
        |"scopeSpans":[{"spans":[
        |{"traceId":"t1","spanId":"s1","name":"op",
        |"startTimeUnixNano":"100","endTimeUnixNano":"200",
        |"attributes":[
        |{"key":"ports","value":{"arrayValue":{"values":[
        |{"intValue":"80"},{"intValue":"443"}]}}},
        |{"key":"ratio","value":{"doubleValue":2.5}},
        |{"key":"blob","value":{"bytesValue":"aGVsbG8="}}]}]}]}]}"""
        .stripMargin.replace("\n", "")
    val attrs = WireFormats.decodeOtlpTraces(Seq(req).toDF("body"))
      .select(col("attrs")).collect()(0).getMap[String, String](0)
    assert(attrs("env.region") == "eu")      // kvlist → dotted prefix
    assert(attrs("ports.0") == "80")         // array → .<index>
    assert(attrs("ports.1") == "443")
    assert(attrs("ratio") == "2.500000")     // fmt %f: fixed six decimals
    assert(!attrs.contains("blob"))          // bytes: no case in the switch
    assert(!attrs.contains("ports"))
  }

  test("native TraceAttrFlatten equals the composed-HOF spec form") {
    val s = spark
    import s.implicits._
    // every shape the flattener handles: scalar kinds (bytes dropped),
    // kvlist and array nesting to the depth bound and BEYOND it (decodes
    // null → no entries), kvlist-in-array, dup keys colliding after the
    // dotted flatten (last-wins, entry moves to the end), empty values
    // arrays, absent values, dotted raw keys
    val attrCases = Seq(
      """[{"key":"s","value":{"stringValue":"x"}},
        |{"key":"i","value":{"intValue":"42"}},
        |{"key":"d","value":{"doubleValue":2.5}},
        |{"key":"dneg","value":{"doubleValue":-0.125}},
        |{"key":"b","value":{"boolValue":true}},
        |{"key":"bytes","value":{"bytesValue":"aGk="}}]""",
      """[{"key":"env","value":{"kvlistValue":{"values":[
        |{"key":"region","value":{"stringValue":"eu"}},
        |{"key":"deep","value":{"kvlistValue":{"values":[
        |{"key":"z","value":{"kvlistValue":{"values":[
        |{"key":"edge","value":{"stringValue":"at-bound"}},
        |{"key":"past-bound","value":{"kvlistValue":{"values":[
        |{"key":"gone","value":{"stringValue":"dropped"}}]}}}]}}},
        |{"key":"keep","value":{"intValue":"7"}}]}}}]}}},
        |{"key":"env.region","value":{"stringValue":"OVERRIDES"}}]""",
      """[{"key":"arr","value":{"arrayValue":{"values":[
        |{"intValue":"80"},
        |{"kvlistValue":{"values":[{"key":"k","value":{"boolValue":false}}]}},
        |{"arrayValue":{"values":[{"stringValue":"deep"}]}}]}}},
        |{"key":"empty","value":{"kvlistValue":{"values":[]}}},
        |{"key":"novalue"},
        |{"key":"dup","value":{"stringValue":"first"}},
        |{"key":"dup","value":{"stringValue":"last"}}]""",
      """[]""").map(_.stripMargin)
    val reqs = attrCases.map(a =>
      s"""{"resourceSpans":[{"resource":{"attributes":${a.replace("\n", "")}},
         |"scopeSpans":[{"spans":[{"traceId":"t","spanId":"s","name":"op",
         |"startTimeUnixNano":"1","endTimeUnixNano":"2",
         |"attributes":${a.replace("\n", "")}}]}]}]}"""
        .stripMargin.replace("\n", ""))
    val parsed = reqs.toDF("body")
      .select(explode(from_json(col("body"), WireFormats.otlpTracesSchema)
        .getField("resourceSpans")).as("rs"))
      .select(col("rs.resource.attributes").as("ra"),
        explode(col("rs.scopeSpans")).as("ss"))
      .select(col("ra"), explode(col("ss.spans")).as("sp"))
      .select(col("ra"), col("sp.attributes").as("sa"))
    // to_json is entry-order sensitive — the comparison pins order too
    val both = parsed.select(
      to_json(graft.functions.TraceAttrs.flatten(col("ra"))).as("nr"),
      to_json(WireFormats.traceAttrsToMapSpec(col("ra"))).as("sr"),
      to_json(graft.functions.TraceAttrs.flatten(col("sa"))).as("ns"),
      to_json(WireFormats.traceAttrsToMapSpec(col("sa"))).as("ss")).collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"resource attrs: $r")
      assert(r.getString(2) == r.getString(3), s"span attrs: $r")
    }
    // and the values themselves are the expected flattened shape
    assert(both(1).getString(0).contains(""""env.deep.keep":"7""""))
    assert(both(1).getString(0).contains(""""env.deep.z.edge":"at-bound""""))
    assert(!both(1).getString(0).contains("past-bound")) // kvlist beyond bound
    assert(both(1).getString(0).endsWith(""""env.region":"OVERRIDES"}"""))
    assert(both(2).getString(0).contains(""""arr.0":"80""""))
    assert(both(2).getString(0).contains(""""arr.1.k":"false""""))
    assert(both(2).getString(0).contains(""""arr.2.0":"deep""""))
    assert(both(2).getString(0).endsWith(""""dup":"last"}"""))
  }

  test("influx float fields render Go %v ('g'): e-notation outside [1e-4,1e21)") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      "m message=\"x\",big=1e21,small=0.00005,mid=2.5,edge=0.0001 1704067200000000000")
      .toDF("line")
    val line = WireFormats.decodeInflux(lines)
      .filter(col("sample_type") === "log")
      .select(col("line")).collect()(0).getString(0)
    assert(line.contains("big=1e+21"))
    assert(line.contains("small=5e-05"))
    assert(line.contains("mid=2.5"))
    assert(line.contains("edge=0.0001"))
  }

  test("OTLP metric attrs with duplicate keys dedupe last-wins, not throw") {
    val s = spark
    import s.implicits._
    // Go map assignment keeps the last occurrence; map_from_entries would
    // throw DUPLICATED_MAP_KEY and fail the whole decode batch
    val req =
      """{"resourceMetrics":[{"resource":{"attributes":[
        |{"key":"env","value":{"stringValue":"old"}},
        |{"key":"env","value":{"stringValue":"new"}}]},
        |"scopeMetrics":[{"metrics":[{"name":"m","gauge":{"dataPoints":[
        |{"timeUnixNano":"1","asDouble":1.0,
        |"attributes":[{"key":"dc","value":{"stringValue":"a"}},
        |{"key":"dc","value":{"stringValue":"b"}}]}]}}]}]}]}"""
        .stripMargin.replace("\n", "")
    val labels = WireFormats.decodeOtlpMetrics(Seq(req).toDF("body"))
      .select(col("labels")).collect()(0).getMap[String, String](0)
    assert(labels("env") == "new")
    assert(labels("dc") == "b")
  }

  test("Datadog metric tags with duplicate keys dedupe last-wins, not throw") {
    val s = spark
    import s.implicits._
    val req =
      """{"series":[{"metric":"cpu","points":[[1704067200,0.5]],
        |"tags":["env:a","env:b","host:h1"],"type":"gauge"}]}"""
        .stripMargin.replace("\n", "")
    val labels = WireFormats.decodeDatadogMetrics(Seq(req).toDF("body"))
      .select(col("labels")).collect()(0).getMap[String, String](0)
    assert(labels("env") == "b")
    assert(labels("host") == "h1")
  }
}
