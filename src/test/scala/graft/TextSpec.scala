package graft

import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Matching behavior of the PII scrub (t10) and TF-IDF ranking (t11) on
  * adversarial inline documents — the synthetic corpus is digit-free, so
  * the oracle only pins the no-op path; the positive cases live here.
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text").select(TextFns.redactPii(col("text"))).head.getString(0)

  test("emails are redacted, including subdomains and plus-tags") {
    assert(redact("mail bob.smith+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("a@b.io,c@d.org") == "<EMAIL>,<EMAIL>")
  }

  test("email runs before IP so dotted domains don't half-match") {
    // A numeric-ish domain: the email pattern must consume it whole.
    assert(redact("x 1a@127.0.0.1x.net y") == "x <EMAIL> y")
  }

  test("phones: 3-3-4 with dash or dot, word-bounded") {
    assert(redact("call 555-867-5309 or 555.867.5309") == "call <PHONE> or <PHONE>")
    assert(redact("id 1555-867-53090 stays") == "id 1555-867-53090 stays")
  }

  test("ipv4 dotted quads") {
    assert(redact("srv 10.0.0.1 and 192.168.1.255") == "srv <IP> and <IP>")
    // A 3-3-4 dotted number is a phone, not an IP (phone pass runs first).
    assert(redact("n 123.456.7890") == "n <PHONE>")
  }

  test("counts match the redaction passes") {
    val row = Seq("a@b.io x 555-867-5309 y 10.0.0.1 z c@d.org").toDF("text")
      .select(
        TextFns.piiCountEmails(col("text")).as("e"),
        TextFns.piiCountPhones(col("text")).as("p"),
        TextFns.piiCountIps(col("text")).as("i"))
      .head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("embedded PII counts as the consuming form only (stage consistency)") {
    // The phone-shaped local part is consumed by the email pass; counts
    // must agree with the redacted text: one <EMAIL>, zero <PHONE>.
    val row = Seq("call 555-867-5309@mail.com now").toDF("text")
      .select(
        TextFns.piiCountEmails(col("text")).as("e"),
        TextFns.piiCountPhones(col("text")).as("p"),
        TextFns.redactPii(col("text")).as("r"))
      .head
    assert(row.getLong(0) == 1L && row.getLong(1) == 0L)
    assert(row.getString(2) == "call <EMAIL> now")
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare common unique"),
      (2L, "common other common"),
      (3L, "common other third")).toDF("doc_id", "text")
    val top = TextFns.tfIdfTop(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 1: 'rare'/'unique' (df=1) outrank 'common' (df=3, idf=0);
    // tie between the two df=1 terms breaks alphabetically.
    assert(top.filter(_._1 == 1L).map(_._3).toSeq == Seq("rare", "unique"))
    // 'common' appears in every doc → idf 0 → never in anyone's top-2
    // unless nothing else is there.
    assert(!top.filter(_._1 == 1L).map(_._3).contains("common"))
  }

  test("repetition signals: hand-computed fractions, incl. sub-gram docs") {
    val docs = Seq(
      (1L, "b b b b b"),       // 5×1-char token
      (2L, "a b"),             // one bigram, no 5-gram
      (3L, "a"),               // no grams at all
      (4L, "c d c d c d c d")) // overlapping duplicated 5-grams
      .toDF("doc_id", "text")
    val got = TextFns.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1: top bigram "b b" ×4 covers 4·2 of 5 word chars = 1.6 (>1 by
    // overlap, as Gopher defines); the single 5-gram is not duplicated.
    assert(got(1L) == ((1.6, 0.0, 0.2)), got(1L))
    // doc 2: the only bigram covers everything; doc too short for 5-grams.
    assert(got(2L) == ((1.0, 0.0, 1.0)), got(2L))
    // doc 3: no bigram → zero coverage, row still present.
    assert(got(3L) == ((0.0, 0.0, 1.0)), got(3L))
    // doc 4: "c d"×4 covers 8/8; both 5-grams appear twice →
    // (2·5 + 2·5)/8 = 2.5.
    assert(got(4L) == ((1.0, 2.5, 0.25)), got(4L))
  }
}
