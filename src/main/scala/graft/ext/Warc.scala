package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC container parsing — the ENTRY-POINT format of every public
  * web-scale corpus (ISO 28500; Common Crawl publishes its petabytes as
  * WARC record streams, with WET/WAT as derived record types). The
  * reference's ingest reads a JSON RPC envelope; a training-data crawl
  * reads this instead, so the engine carries the record layer as a
  * first-class source transform: container text → typed records →
  * HTTP responses → extracted page text (the WET conversion).
  *
  * All per-row column expressions: a corpus of containers parses with ZERO
  * shuffles at any scale, and the html payloads feed [[Url.outlinks]] /
  * [[TextFns.mainContent]] / the dedup family without leaving the row's
  * executor. Character-level reduction, documented: this operates on the
  * container as a STRING column (the binary gzip/member layer belongs to
  * the file reader, like the multimodal family's decode tier), so
  * `Content-Length` frames payloads in CHARACTERS of that string — for the
  * ASCII-header + length-framed layout the two coincide, and both engines
  * (Spark and the DuckDB oracle) apply the same rule. Record BOUNDARIES
  * come from the `WARC/1.0\r\n` version line (a payload containing that
  * exact CRLF-terminated line splits early — the analogue of the html
  * family's non-DOM reductions); WITHIN a record the payload is framed by
  * the declared Content-Length, so blank lines inside payloads do not
  * truncate them (WarcSpec pins this).
  */
object Warc {

  /** Start-of-record sentinel (the WARC version line). WARC/1.1 files use
    * the same record grammar; pass their version line here if needed. */
  val VersionLine = "WARC/1\\.0\\r\\n"

  private def hdrField(hdr: Column, name: String): Column =
    nullif(regexp_extract(hdr, s"(?im)^$name[ \\t]*:[ \\t]*([^\\r\\n]+)", 1),
      lit(""))

  /** One row per WARC record: `(…, rec_pos, warc_type, target_uri,
    * warc_date, content_length, payload)`. `rec_pos` is the record's
    * 1-based position in its container; `warc_type` folds to lowercase
    * (the field's registered values are case-insensitive tokens);
    * `target_uri`/`warc_date` are NULL when the record type does not carry
    * them (warcinfo has no URI). The payload is the `content_length`-framed
    * substring after the header block's blank line — records whose
    * declared length is missing or malformed yield a NULL payload rather
    * than a guessed one (fail-closed: a mis-framed payload poisons every
    * downstream extractor). Carries every `idCol` row key through. */
  def records(df: DataFrame, idCol: String, warcCol: String): DataFrame = {
    val parts = df.select(col(idCol),
      posexplode(split(col(warcCol), VersionLine)).as(Seq("__wpos", "__wchunk")))
      .filter(col("__wpos") >= 1)
    val hdr = substring_index(col("__wchunk"), "\r\n\r\n", 1)
    // digits-only extract (not the generic field pull): a malformed length
    // must yield NULL by regex miss in BOTH engines, not by cast behavior
    // (DuckDB CAST('x' AS BIGINT) throws where Spark yields NULL)
    val clen = nullif(regexp_extract(hdr,
      "(?im)^content-length[ \\t]*:[ \\t]*([0-9]+)", 1), lit("")).cast("long")
    parts.select(col(idCol),
      col("__wpos").cast("long").as("rec_pos"),
      lower(hdrField(hdr, "warc-type")).as("warc_type"),
      hdrField(hdr, "warc-target-uri").as("target_uri"),
      hdrField(hdr, "warc-date").as("warc_date"),
      clen.as("content_length"),
      // payload starts after the header block + the CRLFCRLF separator;
      // substr is 1-based, so start = len(hdr) + 4 + 1
      col("__wchunk").substr(length(hdr) + lit(5), clen).as("payload"))
  }

  /** HTTP status-line pattern over a response record's payload. */
  val StatusPattern = "^HTTP/1\\.[01][ \\t]+([0-9]{3})"

  /** The response records of [[records]] output, with the HTTP layer
    * opened: `(…, rec_pos, target_uri, warc_date, http_status, body)`.
    * The body is everything after the HTTP header block's blank line —
    * within a length-framed payload the remainder IS the entity body
    * (chunked transfer encoding is decoded by the fetcher before archival
    * per the WARC spec's payload definition). Records with no parseable
    * status line keep a NULL status and their raw payload as body, so
    * nothing silently vanishes — filter on `http_status` to keep only
    * well-formed fetches. */
  def httpResponses(recs: DataFrame): DataFrame = {
    val status = nullif(regexp_extract(col("payload"), StatusPattern, 1), lit(""))
    val httpHdr = substring_index(col("payload"), "\r\n\r\n", 1)
    // substr clamps at the string's end, so the payload's own length is a
    // safe "rest of string" bound
    val body = when(status.isNull, col("payload"))
      .otherwise(col("payload").substr(length(httpHdr) + lit(5),
        length(col("payload"))))
    recs.filter(col("warc_type") === "response")
      .select(recs.columns.filter(c => c != "warc_type" && c != "content_length"
          && c != "payload").map(col) :+
        status.cast("int").as("http_status") :+ body.as("body"): _*)
  }

  /** The WET conversion: response records → extracted page text, the
    * record type Common Crawl derives for text-only consumers. Composes
    * [[httpResponses]] with [[TextFns.stripHtml]] (whole-page text — the
    * WET semantic; chain [[TextFns.mainContent]] over `body` instead when
    * the consumer wants boilerplate-free article text). One row per
    * 2xx-status response. */
  def wetText(recs: DataFrame): DataFrame =
    httpResponses(recs)
      .filter(col("http_status") >= 200 && col("http_status") < 300)
      .withColumn("text", TextFns.stripHtml(col("body")))
      .drop("body")
}
