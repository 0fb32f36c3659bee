package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q174 PII-scrub invariants the oracle can't see: both pattern families
  * fire non-vacuously, redaction strictly shortens, and — the property
  * that makes a scrub a scrub — a second pass over the redacted text
  * finds NOTHING (completeness, not just counting). */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  test("q174 plants and catches both PII families; redaction shortens every flagged doc") {
    val out = TextAnalysis.q174(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getInt(1) > 0), "no email detections — vacuous")
    assert(rows.exists(_.getInt(2) > 0), "no phone detections — vacuous")
    assert(rows.exists(r => r.getInt(1) > 0 && r.getInt(2) > 0),
      "doc_id % 77 == 0 docs must carry BOTH families")
    assert(rows.forall(r => r.getLong(3) < r.getLong(4)),
      "redaction must strictly shorten every flagged doc " +
        "(every planted token is longer than its placeholder)")
  }

  test("q174 scrub is complete: re-scanning the redacted text finds zero residual PII") {
    // rebuild the same planted corpus, redact, re-scan
    val raw = concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-"),
          format_string("%03d", pmod(col("doc_id"), lit(1000L))),
          lit("-"),
          format_string("%04d", pmod(col("doc_id"), lit(10000L))),
          lit(" ok"))).otherwise(lit("")))
    val residual = graft.core.Tables(spark, dir, "documents")
      .select(regexp_replace(regexp_replace(raw, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("clean"))
      .select(
        sum(regexp_count(col("clean"), lit(emailRe))).as("e"),
        sum(regexp_count(col("clean"), lit(phoneRe))).as("p"))
      .head()
    assert(residual.getLong(0) === 0L, "residual emails after scrub")
    assert(residual.getLong(1) === 0L, "residual phones after scrub")
  }

  test("q176 pseudonymization preserves linkage: many docs, few stable tokens") {
    val rows = TextAnalysis.q176(spark, dir).collect()
    val emailDocs = rows.filter(_.getString(1) != null)
    val phoneDocs = rows.filter(_.getString(2) != null)
    assert(emailDocs.nonEmpty && phoneDocs.nonEmpty)
    // per-match token lists are comma-joined; count DISTINCT tokens
    val emailTokens = emailDocs.flatMap(_.getString(1).split(",")).toSet
    val phoneTokens = phoneDocs.flatMap(_.getString(2).split(",")).toSet
    // shared plant: ≤ 20 distinct emails / ≤ 40 distinct phones, so if
    // linkage is preserved the token sets are FAR smaller than the
    // flagged doc sets (redaction would have collapsed them to ONE)
    assert(emailTokens.size <= 20 && emailTokens.size > 1,
      s"expected 2..20 distinct email tokens, got ${emailTokens.size}")
    assert(phoneTokens.size <= 40 && phoneTokens.size > 1,
      s"expected 2..40 distinct phone tokens, got ${phoneTokens.size}")
    assert(emailDocs.length > emailTokens.size,
      "no two docs share an email token — linkage claim is vacuous")
    // consistency: equal plants (same doc_id residue) → equal tokens,
    // on the single-email docs (7∤13: the mod-13 second plant absent)
    val byResidue = emailDocs
      .filter(r => r.getLong(0) % 7 == 0 && r.getLong(0) % 13 != 0)
      .groupBy(r => r.getLong(0) % 20)
      .values.filter(_.length > 1)
    assert(byResidue.nonEmpty)
    byResidue.foreach { g =>
      assert(g.map(_.getString(1)).toSet.size === 1,
        "same planted email produced different pseudonyms")
    }
  }

  test("q176 is per-match: a two-email doc keeps BOTH values' own tokens") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def tok(fam: String, v: String) = s"<$fam:${md5hex(v).take(8)}>"
    val rows = TextAnalysis.q176(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // docs ≡ 0 mod 7 AND mod 13 carry TWO distinct planted emails; the
    // round-9 defect rewrote the second with the first's token
    val twoEmail = rows.keys.filter(d => d % 7 == 0 && d % 13 == 0 && d > 0)
    assert(twoEmail.nonEmpty, "fixture lost its two-email docs")
    twoEmail.foreach { d =>
      val expected = Seq(d % 20, (d + 7) % 20)
        .map(r => s"user$r@example.com").sorted
        .map(tok("EMAIL", _)).mkString(",")
      assert(rows(d).getString(1) == expected,
        s"doc $d: expected per-match tokens $expected, " +
          s"got ${rows(d).getString(1)}")
    }
    val twoPhone = rows.keys.filter(d => d % 11 == 0 && d % 17 == 0 && d > 0)
    assert(twoPhone.nonEmpty, "fixture lost its two-phone docs")
    twoPhone.foreach { d =>
      val expected = Seq(d % 40, (d + 13) % 40)
        .map(r => f"555-$r%03d-$r%04d").sorted
        .map(tok("PHONE", _)).mkString(",")
      assert(rows(d).getString(2) == expected,
        s"doc $d: expected per-match tokens $expected, " +
          s"got ${rows(d).getString(2)}")
    }
  }
}
