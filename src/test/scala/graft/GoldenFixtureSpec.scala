package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.codec.LinksFlattener
import graft.codec.LinksFlattener.{Polymorphic, ToMany, ToOne}
import graft.consumer.ConsumerOps

/** The reference's golden deserializer fixture (FIXTURES.md §2, verbatim
  * from spec/dionysus/consumer/deserializer_spec.rb:10-68) driven through
  * envelope decode → links flattening → reserved-attribute mapping, and
  * asserted against the canonical output contract
  * (deserializer.rb:41-52,125-135,143-145).
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{
      |  "id": 1,
      |  "name": "BookingSync",
      |  "created_at": "2020-01-01 12:00:00",
      |  "updated_at": "2020-01-02 12:00:01",
      |  "canceled_at": "2020-01-02 12:00:02",
      |  "comments": [ { "content": "comment" } ],
      |  "settings": { "default_arrival_time": 11 },
      |  "links": {
      |    "account": 2,
      |    "fee": 10,
      |    "bookings": [3, 4],
      |    "rental": null,
      |    "taxes": [],
      |    "clients": [20],
      |    "users": [],
      |    "bookable": { "type": "Property", "id": 123 },
      |    "empty_bookable": {}
      |  },
      |  "fee": {
      |    "links": { "rentals_fee": 101 },
      |    "id": 10,
      |    "name": "cleaning",
      |    "rentals_fee": {
      |      "id": 101, "always_applied": true,
      |      "created_at": "2021-01-01 12:00:00",
      |      "updated_at": "2021-01-02 12:00:01",
      |      "canceled_at": "2021-01-02 12:00:02"
      |    }
      |  },
      |  "bookable": { "links": {}, "id": 123, "synced_created_at": "2100-01-01 12:00:00" },
      |  "clients": [
      |    {
      |      "links": { "messages": [201] },
      |      "id": 20,
      |      "fullname": "Rich Piana",
      |      "messages": [ { "id": 201, "message": "inbox message" } ]
      |    }
      |  ]
      |}""".stripMargin

  // registry-derived schema for the fixture model (SURVEY §1.2): links
  // shapes are declared, unknown attrs survive in the raw payload string
  private val linksSchema = StructType(Seq(
    StructField("account", LongType), StructField("fee", LongType),
    StructField("bookings", ArrayType(LongType)),
    StructField("rental", LongType),
    StructField("taxes", ArrayType(LongType)),
    StructField("clients", ArrayType(LongType)),
    StructField("users", ArrayType(LongType)),
    StructField("bookable", StructType(Seq(
      StructField("type", StringType), StructField("id", LongType)))),
    StructField("empty_bookable", StructType(Seq(
      StructField("type", StringType), StructField("id", LongType))))))

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("canceled_at", StringType),
    StructField("comments", ArrayType(StructType(Seq(StructField("content", StringType))))),
    StructField("settings", StructType(Seq(StructField("default_arrival_time", LongType)))),
    StructField("links", linksSchema),
    StructField("fee", StructType(Seq(
      StructField("links", StructType(Seq(StructField("rentals_fee", LongType)))),
      StructField("id", LongType), StructField("name", StringType),
      StructField("rentals_fee", StructType(Seq(
        StructField("id", LongType), StructField("always_applied", BooleanType),
        StructField("created_at", StringType), StructField("updated_at", StringType),
        StructField("canceled_at", StringType))))))),
    StructField("bookable", StructType(Seq(
      StructField("links", StructType(Nil)),
      StructField("id", LongType), StructField("synced_created_at", StringType)))),
    StructField("clients", ArrayType(StructType(Seq(
      StructField("links", StructType(Seq(StructField("messages", ArrayType(LongType))))),
      StructField("id", LongType), StructField("fullname", StringType),
      StructField("messages", ArrayType(StructType(Seq(
        StructField("id", LongType), StructField("message", StringType)))))))))))

  private lazy val parsed = Seq(payload).toDF("payload_json")
    .withColumn("r", from_json($"payload_json", schema))
    .select($"payload_json", $"r.*")

  test("links classification: scalar, array, empty, null, polymorphic") {
    val flat = LinksFlattener.flatten(parsed, Seq(
      "account" -> ToOne, "fee" -> ToOne, "rental" -> ToOne,
      "bookings" -> ToMany, "taxes" -> ToMany, "clients" -> ToMany,
      "users" -> ToMany, "bookable" -> Polymorphic,
      "empty_bookable" -> Polymorphic))
    val row = ConsumerOps.mapReservedAttrs(flat).collect()(0)
    def g[T](c: String): T = row.getAs[T](c)
    def gl(c: String): List[Long] = row.getSeq[Long](row.fieldIndex(c)).toList
    assert(g[Long]("synced_id") == 1L)
    assert(g[String]("synced_created_at") == "2020-01-01 12:00:00")
    assert(g[String]("synced_updated_at") == "2020-01-02 12:00:01")
    assert(g[String]("synced_canceled_at") == "2020-01-02 12:00:02")
    assert(g[Long]("synced_account_id") == 2L)
    assert(g[Long]("synced_fee_id") == 10L)
    assert(row.isNullAt(row.fieldIndex("synced_rental_id")))
    assert(gl("synced_booking_ids") == List(3L, 4L))
    assert(gl("synced_tax_ids") == List())
    assert(gl("synced_client_ids") == List(20L))
    assert(gl("synced_user_ids") == List())
    assert(g[Long]("synced_bookable_id") == 123L)
    assert(g[String]("synced_bookable_type") == "Property")
    assert(row.isNullAt(row.fieldIndex("synced_empty_bookable_id")))
    // plain attributes pass through untouched
    assert(g[String]("name") == "BookingSync")
    assert(row.getAs[org.apache.spark.sql.Row]("settings").getLong(0) == 11L)
    assert(row.getAs[Seq[org.apache.spark.sql.Row]]("comments").head.getString(0) == "comment")
  }

  test("nested has_one recursion: fee → rentals_fee with its own links") {
    val fee = parsed.select($"fee.*")
    val feeFlat = LinksFlattener.flatten(fee, Seq("rentals_fee" -> ToOne))
    val feeRow = ConsumerOps.mapReservedAttrs(feeFlat).collect()(0)
    assert(feeRow.getAs[Long]("synced_id") == 10L)
    assert(feeRow.getAs[Long]("synced_rentals_fee_id") == 101L)
    val rf = ConsumerOps.mapReservedAttrs(parsed.select($"fee.rentals_fee.*")).collect()(0)
    assert(rf.getAs[Long]("synced_id") == 101L)
    assert(rf.getAs[Boolean]("always_applied"))
    assert(rf.getAs[String]("synced_canceled_at") == "2021-01-02 12:00:02")
  }

  test("nested has_many recursion: clients → messages") {
    val clients = parsed.select(explode($"clients").as("c")).select($"c.*")
    val cFlat = LinksFlattener.flatten(clients, Seq("messages" -> ToMany))
    val cRow = ConsumerOps.mapReservedAttrs(cFlat).collect()(0)
    assert(cRow.getAs[Long]("synced_id") == 20L)
    assert(cRow.getAs[String]("fullname") == "Rich Piana")
    assert(cRow.getSeq[Long](cRow.fieldIndex("synced_message_ids")).toList == List(201L))
    val msgs = clients.select(explode($"messages").as("m")).select($"m.*")
    val mRow = ConsumerOps.mapReservedAttrs(msgs).collect()(0)
    assert(mRow.getAs[Long]("synced_id") == 201L)
    assert(mRow.getAs[String]("message") == "inbox message")
  }

  test("single-record fast decode: parity with general path, tombstone skip, guard rails") {
    import graft.codec.EnvelopeCodec
    def envelope(payloads: String*): String =
      s"""{"message":[{"event":"thing_updated","model_name":"thing","data":[${payloads.mkString(",")}]}]}"""
    val single = envelope("\"{\\\"id\\\":1,\\\"v\\\":2}\"")
    val zeroRecord = envelope() // empty data array
    val frame = Seq(Some(single), Some(zeroRecord), None) // None = tombstone
      .toDF("value")
    val fast = EnvelopeCodec.decodeSingleRecords(frame)
      .select("event", "model_name", "payload_json").as[(String, String, String)]
      .collect()
    val general = EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(frame))
      .select("event", "model_name", "payload_json").as[(String, String, String)]
      .collect()
    // tombstone and the zero-record envelope yield NO row on either path;
    // the real record decodes identically
    assert(fast.toSeq == general.toSeq, s"${fast.toSeq} vs ${general.toSeq}")
    assert(fast.length == 1 && fast(0)._3 == """{"id":1,"v":2}""")
    // a multi-record envelope fails loudly instead of truncating
    val multi = Seq(envelope("\"{\\\"id\\\":1}\"", "\"{\\\"id\\\":2}\"")).toDF("value")
    val err = intercept[Exception](
      EnvelopeCodec.decodeSingleRecords(multi).collect())
    assert(err.getMessage.contains("singleRecordWire"), err.getMessage)
    // ... even when the FIRST record slot is a JSON null (the tombstone
    // drop must not swallow the second record silently)
    val nullFirst = Seq(envelope("null", "\"{\\\"id\\\":2}\"")).toDF("value")
    val err2 = intercept[Exception](
      EnvelopeCodec.decodeSingleRecords(nullFirst).collect())
    assert(err2.getMessage.contains("singleRecordWire"), err2.getMessage)
    // ... even when the null slot TRAILS the record (`data:["x",null]`) —
    // an element-presence probe reads a trailing null as "no second
    // record" and silently drops it; the guard must count, not probe
    val nullTrailing = Seq(envelope("\"{\\\"id\\\":1}\"", "null")).toDF("value")
    val errT = intercept[Exception](
      EnvelopeCodec.decodeSingleRecords(nullTrailing).collect())
    assert(errT.getMessage.contains("singleRecordWire"), errT.getMessage)
    // trailing-null envelope on the GENERAL path: the null slot explodes
    // to a null-payload row alongside the real record — nothing is
    // silently swallowed on either path
    val generalT = EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(nullTrailing))
      .select("payload_json").collect()
    assert(generalT.length == 2 && generalT.count(_.isNullAt(0)) == 1)
    // a second-event slot that is a trailing JSON null is likewise multi
    val nullSecondEvent = Seq(
      s"""{"message":[{"event":"thing_updated","model_name":"thing","data":["{}"]},null]}""")
      .toDF("value")
    val errE = intercept[Exception](
      EnvelopeCodec.decodeSingleRecords(nullSecondEvent).collect())
    assert(errE.getMessage.contains("singleRecordWire"), errE.getMessage)
    // ... and even when downstream prunes payload_json entirely — the
    // guard lives in the filter, not in a prunable projection
    val err3 = intercept[Exception](
      EnvelopeCodec.decodeSingleRecords(multi)
        .groupBy("model_name").count().collect())
    assert(err3.getMessage.contains("singleRecordWire"), err3.getMessage)
    // the guard is STRUCTURAL, not positional: every output column routes
    // through it, so a single-column projection of a multi envelope raises
    // even if an optimizer were to split/reorder the filter's conjuncts
    // (the row-keep term never drops a multi row)
    for (c <- Seq("event", "model_name", "payload_json")) {
      val errC = intercept[Exception](
        EnvelopeCodec.decodeSingleRecords(multi).select(c).collect())
      assert(errC.getMessage.contains("singleRecordWire"), s"$c: ${errC.getMessage}")
    }
  }

  test("codec fuzz: encode → fast decode round-trips arbitrary payload strings") {
    import graft.codec.EnvelopeCodec
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // payloads with every string hazard the wire can carry: quotes,
    // backslashes, unicode, control-ish chars, JSON-looking text — the
    // raw-capture decode must return each payload VERBATIM, byte-equal
    // to what encode was given, on both decode paths
    val hazard = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("\"", "\\", "{", "}", "[", "]", ",", ":", "null",
        "é", "雪", "🙂", "\t", " a b ", "{\"k\":\"v\"}", "[1,null]"),
      Gen.listOfN(5, Gen.asciiPrintableChar).map(_.mkString))
    def jsonStr(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append("\"").toString
    }
    val payloadGen = for {
      parts <- Gen.listOfN(4, hazard)
      id <- Gen.choose(1L, 999L)
    } yield s"""{"id":$id,"blob":${jsonStr(parts.mkString)}}"""
    val prop = Prop.forAll(Gen.listOfN(8, payloadGen)) { payloads =>
      val in = payloads.map(p => ("thing_updated", "thing", Seq(p)))
        .toDF("event", "model_name", "data")
      val encoded = EnvelopeCodec.encode(in).select("value")
      val fast = EnvelopeCodec.decodeSingleRecords(encoded)
        .select("payload_json").as[String].collect().toList
      val general = EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(encoded))
        .select("payload_json").as[String].collect().toList
      fast.sorted == payloads.sorted && general.sorted == payloads.sorted
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("unknown attributes survive in the raw payload (synced_data)") {
    // the raw JSON string rides alongside the parsed struct — a consumer
    // stores it as synced_data even when no local column exists
    val raw = parsed.select(get_json_object($"payload_json", "$.settings.default_arrival_time"))
      .as[String].collect()(0)
    assert(raw == "11")
  }
}
