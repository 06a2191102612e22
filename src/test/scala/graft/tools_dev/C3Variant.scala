package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.codec.EnvelopeCodec

/** Dev probe: envelope decode alternatives — from_json (baseline) vs
  * parse_json+variant_get vs get_json_object fan-out. */
object C3Variant {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val ev = graft.queries.Q.tbl(spark, dir, "events")
    val payload = ev.select(
      lit("event_created").as("event"),
      lit("Event").as("model_name"),
      array(to_json(struct(
        col("event_id"), col("event_type"), col("value")))).as("data"))
    val enc = EnvelopeCodec.encode(payload).select("value").localCheckpoint(true)
    for (p <- 1 to 3) {
      println(s"--- pass $p")
      t("from_json full")(
        EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(enc)).count())
      t("variant")(
        enc.select(parse_json(col("value")).as("v"))
          .select(
            try_variant_get(col("v"), "$.message[0].event", "string").as("event"),
            try_variant_get(col("v"), "$.message[0].model_name", "string").as("model_name"),
            try_variant_get(col("v"), "$.message[0].data[0]", "string").as("payload_json"))
          .count())
      t("get_json_object x3")(
        enc.select(
            get_json_object(col("value"), "$.message[0].event").as("event"),
            get_json_object(col("value"), "$.message[0].model_name").as("model_name"),
            get_json_object(col("value"), "$.message[0].data[0]").as("payload_json"))
          .count())
      t("get_json_object x5")(
        enc.select(
            get_json_object(col("value"), "$.message[1]").as("m1"),
            get_json_object(col("value"), "$.message[0].data[1]").as("d1"),
            get_json_object(col("value"), "$.message[0].event").as("event"),
            get_json_object(col("value"), "$.message[0].model_name").as("model_name"),
            get_json_object(col("value"), "$.message[0].data[0]").as("payload_json"))
          .count())
      t("fast+explode no-cond")(
        enc.select(
            array(struct(
              get_json_object(col("value"), "$.message[0].event").as("event"),
              get_json_object(col("value"), "$.message[0].model_name").as("model_name"),
              array(get_json_object(col("value"), "$.message[0].data[0]")).as("data"))).as("message"))
          .select(explode(col("message")).as("m"))
          .select(col("m.event"), col("m.model_name"), col("m.data"))
          .count())
      t("carry-value design")({
        val emptyMsg = array(struct(
          lit(null).cast("string").as("event"),
          lit(null).cast("string").as("model_name"),
          lit(null).cast("array<string>").as("data")))
        val pre = enc.filter(col("value").isNotNull).select(col("value"),
          (get_json_object(col("value"), "$.message[1]").isNull &&
           get_json_object(col("value"), "$.message[0].data[1]").isNull).as("__single"))
        pre.select(col("value"), col("__single"),
            explode(when(col("__single"), emptyMsg)
              .otherwise(from_json(col("value"), graft.model.Schemas.envelope)
                .getField("message"))).as("m"))
          .select(
            when(col("__single"), get_json_object(col("value"), "$.message[0].event"))
              .otherwise(col("m.event")).as("event"),
            when(col("__single"), get_json_object(col("value"), "$.message[0].model_name"))
              .otherwise(col("m.model_name")).as("model_name"),
            when(col("__single"), array(get_json_object(col("value"), "$.message[0].data[0]")))
              .otherwise(col("m.data")).as("data"))
          .count()
      })
      t("cond no-explode")(
        enc.select(
            when(get_json_object(col("value"), "$.message[1]").isNull &&
                 get_json_object(col("value"), "$.message[0].data[1]").isNull,
              array(struct(
                get_json_object(col("value"), "$.message[0].event").as("event"),
                get_json_object(col("value"), "$.message[0].model_name").as("model_name"),
                array(get_json_object(col("value"), "$.message[0].data[0]")).as("data"))))
              .otherwise(from_json(col("value"), graft.model.Schemas.envelope).getField("message"))
              .as("message"))
          .count())
    }
    spark.stop()
  }
}
