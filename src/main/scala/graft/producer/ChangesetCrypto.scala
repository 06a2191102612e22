package graft.producer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P24 — changeset encryption at rest.
  *
  * The reference stores the outbox `changeset` column encrypted when it
  * holds GDPR-scoped attribute values: `encrypts_changeset!` serializes
  * the payload to JSON before the column encryptor persists it, and
  * `transformed_changeset` parses it back on read (reference:
  * lib/dionysus/producer/outbox/model.rb:40-45, README.md:636-647).
  *
  * The Spark form seals the `__changeset` map (attr → [old, new]) into
  * one opaque string column — JSON → AES-GCM → base64 — with Spark's
  * native `aes_encrypt`/`aes_decrypt` expressions, so sealing and
  * opening stay inside codegen'd projections (no UDF, no driver round
  * trip) and the sealed feed shuffles/stores like any string column.
  * GCM draws a random IV per row, so ciphertexts are non-deterministic
  * (as with the reference's pgp encryptor) while `open(seal(x)) == x`
  * always holds; nothing downstream may compare sealed bytes.
  *
  * OPERATIONAL NOTE — the key is a plan literal: it appears in
  * `explain` output, the Spark UI SQL tab, and event logs unless
  * redacted. Deployments MUST set `spark.redaction.string.regex` to
  * match the key (Spark redacts matching fragments from plan strings
  * and event logs); treat history-server storage as key-visible
  * otherwise. The reference has the same property — its key rides in
  * an ENV var into SQL issued by crypt_keeper (README.md:644).
  */
object ChangesetCrypto {

  /** Schema of the plaintext changeset column (built by
    * [[EventClassifier.changeset]]). */
  val ChangesetDDL = "map<string,array<string>>"

  /** AES accepts 128/192/256-bit keys only; fail at registration time,
    * not in a running stream. */
  def requireValidKey(key: String): Unit = {
    val n = key.getBytes("UTF-8").length
    require(n == 16 || n == 24 || n == 32,
      s"changeset key must be 16, 24 or 32 bytes (got $n)")
  }

  /** The key rides into the plan as a literal (see OPERATIONAL NOTE):
    * verify the session's plan-string redaction actually covers it —
    * at wiring time, not after the key has leaked into event logs. With
    * `strict` the check throws; otherwise it logs one warning per JVM
    * per key. A deployment that accepts plan-visible keys (dev) passes
    * `strict = false` and keeps the warning. */
  def checkRedaction(spark: org.apache.spark.sql.SparkSession, key: String,
      strict: Boolean = false): Unit =
    // Spark consults the SQL conf spark.sql.redaction.string.regex for
    // plan-string redaction, FALLING BACK to the core
    // spark.redaction.string.regex (SQLConf.STRING_REDACTION_PATTERN has
    // the core conf as its fallback) — check the same precedence, or a
    // deployment redacting via the SQL conf would fail strict mode while
    // one overriding the fallback with a non-covering SQL pattern would
    // silently pass
    checkRedaction(
      spark.conf.getOption("spark.sql.redaction.string.regex")
        .orElse(spark.sparkContext.getConf
          .getOption("spark.redaction.string.regex")),
      key, strict)

  def checkRedaction(redactionRegex: Option[String], key: String,
      strict: Boolean): Unit = {
    val covered = redactionRegex
      .exists(r => try r.r.findFirstIn(key).isDefined catch {
        case _: Exception => false
      })
    if (!covered) {
      val msg = "changeset key is NOT matched by spark.redaction.string.regex: " +
        "it will appear verbatim in explain output, the Spark UI SQL tab " +
        "and event logs. Set the regex to cover the key."
      if (strict) throw new IllegalStateException(msg)
      // dedup on a digest — the static set must not pin the raw secret
      // in driver memory for the JVM lifetime
      if (warned.add(java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
  }
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Both directions embed the key as a plan literal — check on sealing
    * as well as opening. The consuming engine's wiring passes its
    * deployment intent through [[graft.Engine.EngineOptions]]
    * `strictKeyRedaction`; a produce-only deployment has no engine
    * wiring, so [[seal]] takes `strict` directly — pass `strict = true`
    * to fail the job instead of logging when the session's redaction
    * regex does not cover the key. */
  private def checkActiveSession(key: String, strict: Boolean): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
      case Some(s) => checkRedaction(s, key, strict)
      // strict mode fails CLOSED: with no session there is no conf to
      // verify against, and silently skipping would void exactly the
      // guarantee the flag advertises (Column construction needs no
      // session, so wiring code can run before SparkSession creation)
      case None if strict => throw new IllegalStateException(
        "strict key-redaction check requires an active or default " +
          "SparkSession — build the session first, or pass strict = false")
      case None => ()
    }

  /** Storage form of a changeset map: `base64(aes_gcm(json))`. With
    * `strict = true` the call throws (rather than warns) when the
    * active session's plan-string redaction does not cover the key —
    * the produce-only analogue of `EngineOptions.strictKeyRedaction`,
    * whose wiring-time check covers only consuming engines. */
  def seal(changeset: Column, key: String, strict: Boolean = false): Column = {
    requireValidKey(key)
    checkActiveSession(key, strict)
    base64(aes_encrypt(to_json(changeset), lit(key)))
  }

  /** Inverse of [[seal]]: back to the `map<string,array<string>>`
    * the observer match ([[Observers.matches]]) reads. A wrong key
    * fails the query loudly (AES-GCM authenticates) rather than
    * matching observers against garbage. `strict` as in [[seal]] —
    * engine wiring passes `EngineOptions.strictKeyRedaction` through
    * its own wiring-time check instead. */
  def open(stored: Column, key: String, strict: Boolean = false): Column = {
    requireValidKey(key)
    checkActiveSession(key, strict)
    from_json(aes_decrypt(unbase64(stored), lit(key)).cast("string"),
      ChangesetDDL, Map.empty[String, String])
  }
}
