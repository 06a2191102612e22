package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.codec.EnvelopeCodec

/** Dev probe: where does c03's time go? (read, payload encode, envelope
  * encode, envelope decode, payload decode, sort) */
object C3Decomp {
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
    for (p <- 1 to 2) {
      println(s"--- pass $p")
      t("read")(ev.count())
      val payload = ev.select(
        lit("event_created").as("event"),
        lit("Event").as("model_name"),
        array(to_json(struct(
          col("event_id"), col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k")))).as("data"))
      t("payload+props")(payload.count())
      val enc = EnvelopeCodec.encode(payload).select("value")
      t("encode")(enc.count())
      val cached = enc.localCheckpoint(true)
      t("decode-envelope")(EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(cached)).count())
      val dec = EnvelopeCodec.explodeRecords(EnvelopeCodec.decode(cached))
        .withColumn("rec", from_json(col("payload_json"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id LONG, event_type STRING, value DOUBLE, k LONG")))
        .select(col("rec.event_id").as("event_id"))
      t("decode-both")(dec.count())
      t("full+sort")(dec.orderBy(col("event_id")).count())
      cached.unpersist()
    }
    spark.stop()
  }
}
