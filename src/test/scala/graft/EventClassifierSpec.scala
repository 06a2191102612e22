package graft

import org.apache.spark.sql.functions._
import graft.producer.EventClassifier
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** P2 soft-delete state machine — the reference's trickiest case analysis
  * (outbox.rb:74-102), property-tested against a direct Scala oracle. */
class EventClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Direct transcription of the reference truth table. */
  private def oracle(op: String, oldC: Option[String], newC: Option[String],
      afterSoftDelete: Boolean): Option[String] = op match {
    case "insert" => Some("created")
    case "delete" => Some("destroyed")
    case _ => (oldC.isDefined, newC.isDefined) match {
      case (false, true) => Some("destroyed")
      case (true, false) => Some("created")
      case (true, true) => if (afterSoftDelete) Some("updated") else None
      case _ => Some("updated")
    }
  }

  private def run(cases: Seq[(String, Option[String], Option[String])],
      afterSoftDelete: Boolean): Seq[Option[String]] = {
    val df = cases.zipWithIndex
      .map { case ((op, o, n), i) => (i, op, o.orNull, n.orNull) }
      .toDF("i", "op", "old_c", "new_c")
    df.withColumn("et", EventClassifier.eventType(
        col("op"), col("old_c"), col("new_c"), afterSoftDelete))
      .orderBy("i").select("et").collect()
      .map(r => Option(r.getString(0))).toSeq
  }

  test("state machine matches reference truth table (all 12 cases)") {
    val ops = Seq("insert", "update", "delete")
    val cancels = Seq(None, Some("t"))
    for (after <- Seq(false, true)) {
      val cases = for { op <- ops; o <- cancels; n <- cancels } yield (op, o, n)
      val got = run(cases, after)
      val want = cases.map { case (op, o, n) => oracle(op, o, n, after) }
      assert(got == want, s"afterSoftDelete=$after")
    }
  }

  test("property: random op sequences classify consistently") {
    val genCase = for {
      op <- Gen.oneOf("insert", "update", "delete")
      o <- Gen.option(Gen.const("x"))
      n <- Gen.option(Gen.const("x"))
    } yield (op, o, n)
    val prop = Prop.forAll(Gen.listOfN(20, genCase)) { cases =>
      cases.isEmpty ||
        run(cases, afterSoftDelete = false) ==
          cases.map { case (op, o, n) => oracle(op, o, n, afterSoftDelete = false) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
