package graft

import org.apache.spark.sql.functions._
import graft.ext.Warc

/** [[graft.ext.Warc]] — WARC container parsing: version-line record split,
  * header fields, Content-Length framing (the property that distinguishes
  * this from a naive split-on-blank-line parser), the HTTP layer, and the
  * WET composition. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private val crlf = "\r\n"

  private def rec(headers: String, payload: String): String =
    "WARC/1.0" + crlf + headers +
      "Content-Length: " + payload.length + crlf + crlf +
      payload + crlf + crlf

  test("records: split, fields, 1-based positions, length framing") {
    // the response payload CONTAINS a blank line (HTTP header/body split):
    // framing must carry past it, a first-blank-line parser truncates
    val p1 = "HTTP/1.1 200 OK" + crlf + "Content-Type: text/html" + crlf +
      crlf + "<html>body one</html>"
    val p2 = "just text"
    val container =
      rec("WARC-Type: warcinfo" + crlf, "software: t/1.0") +
        rec("WARC-Type: response" + crlf +
          "WARC-Target-URI: https://ex.org/a" + crlf +
          "WARC-Date: 2026-03-02T00:00:00Z" + crlf, p1) +
        rec("WARC-Type: conversion" + crlf +
          "WARC-Target-URI: https://ex.org/a" + crlf, p2)
    val out = Warc.records(Seq((7L, container)).toDF("id", "warc"), "id", "warc")
      .orderBy("rec_pos")
      .select("rec_pos", "warc_type", "target_uri", "warc_date",
        "content_length", "payload")
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getString(1)).toSeq ===
      Seq("warcinfo", "response", "conversion"))
    assert(out(0).isNullAt(2)) // warcinfo carries no target URI
    assert(out(1).getString(2) === "https://ex.org/a")
    assert(out(1).getString(3) === "2026-03-02T00:00:00Z")
    assert(out(2).isNullAt(3)) // no date on the third record
    assert(out(1).getLong(4) === p1.length.toLong)
    assert(out(1).getString(5) === p1) // full payload, past its blank line
    assert(out(2).getString(5) === p2)
  }

  test("records: missing/malformed Content-Length fails closed to NULL payload") {
    val c = "WARC/1.0" + crlf + "WARC-Type: metadata" + crlf + crlf +
      "unframed" + crlf + crlf +
      "WARC/1.0" + crlf + "WARC-Type: metadata" + crlf +
      "Content-Length: zzz" + crlf + crlf + "alsounframed" + crlf + crlf
    val out = Warc.records(Seq((1L, c)).toDF("id", "warc"), "id", "warc")
      .orderBy("rec_pos").select("content_length", "payload").collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(0)))
    assert(out.forall(_.isNullAt(1)))
  }

  test("records: payload longer than declared length truncates to the frame") {
    // trailing garbage between records attaches to the preceding chunk;
    // the declared length keeps it out of the payload
    val c = "WARC/1.0" + crlf + "WARC-Type: resource" + crlf +
      "Content-Length: 5" + crlf + crlf + "abcdeGARBAGE" + crlf + crlf
    val out = Warc.records(Seq((1L, c)).toDF("id", "warc"), "id", "warc")
      .select("payload").collect()
    assert(out(0).getString(0) === "abcde")
  }

  test("httpResponses: status, header/body split, statusless passthrough") {
    val good = "HTTP/1.1 301 Moved" + crlf + "Location: /b" + crlf + crlf +
      "redirect body"
    val bare = "no status line here"
    val c = rec("WARC-Type: response" + crlf + "WARC-Target-URI: u1" + crlf, good) +
      rec("WARC-Type: request" + crlf, "GET / HTTP/1.1" + crlf + crlf) +
      rec("WARC-Type: response" + crlf + "WARC-Target-URI: u2" + crlf, bare)
    val out = Warc.httpResponses(
      Warc.records(Seq((1L, c)).toDF("id", "warc"), "id", "warc"))
      .orderBy("rec_pos").select("target_uri", "http_status", "body").collect()
    assert(out.length === 2) // the request record is not a response
    assert(out(0).getString(0) === "u1")
    assert(out(0).getInt(1) === 301)
    assert(out(0).getString(2) === "redirect body")
    assert(out(1).isNullAt(1)) // no parseable status line
    assert(out(1).getString(2) === bare) // raw payload kept, nothing vanishes
  }

  test("wetText: 2xx-only text extraction through the stripHtml chain") {
    def resp(status: String, html: String) =
      rec("WARC-Type: response" + crlf + "WARC-Target-URI: u" + crlf,
        "HTTP/1.1 " + status + crlf + crlf + html)
    val c = resp("200 OK", "<p>keep me</p>") +
      resp("404 Not Found", "<p>drop me</p>") +
      resp("204 No Content", "")
    val out = Warc.wetText(
      Warc.records(Seq((1L, c)).toDF("id", "warc"), "id", "warc"))
      .orderBy("rec_pos").select("http_status", "text").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(200, 204))
    assert(out(0).getString(1) === "keep me")
    assert(out(1).getString(1) === "")
  }
}
