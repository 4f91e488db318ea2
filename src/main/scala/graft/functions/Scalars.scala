package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — scalar function surface of the reference, expressed with
  * codegen'd `org.apache.spark.sql.functions` (no UDFs on hot paths).
  */
object Scalars {

  /** F1 — SHA-256 content checksum (reference: chunked file hashing,
    * shared/utils/__init__.py:61-69; used at services/file-service/main.py:125).
    * Works on both binary and string columns; lowercase hex like the
    * reference's hexdigest. */
  def sha256Hex(c: Column): Column = sha2(c, 256)

  /** F2/F3 — unique filename: fresh UUID + preserved original extension
    * (reference: shared/utils/__init__.py:72-76). */
  def uniqueFilename(original: Column): Column =
    concat(expr("uuid()"), regexp_extract(original, "(\\.[^.]+)$", 1))

  /** F6 — timestamp + interval (token expiry,
    * reference: shared/utils/__init__.py:37-42). */
  def plusMinutes(ts: Column, minutes: Int): Column =
    ts + expr(s"INTERVAL $minutes MINUTES")

  /** F7 — ceil division for page counts
    * (reference: `(total+size-1)//size`, shared/utils/__init__.py:163). */
  def ceilDiv(total: Column, size: Column): Column =
    ceil(total.cast("double") / size).cast("long")

  /** F8 — exponential-backoff delay series: `delay · backoff^attempt`
    * (reference: retry_with_backoff, shared/utils/__init__.py:255-271). */
  def backoffDelay(attempt: Column, delay: Double = 1.0, backoff: Double = 2.0): Column =
    lit(delay) * pow(lit(backoff), attempt)

  /** F9 — JSON-serialize a struct of columns (structured log records,
    * reference: shared/utils/__init__.py:114-129). */
  def asJson(cols: Column*): Column = to_json(struct(cols: _*))

  /** F10 — JSONB field access (reference: metadata/parameters/results columns,
    * init.sql:49,63,104-105,119-120). */
  def jsonField(c: Column, path: String): Column = get_json_object(c, path)

  /** F12 — config-style string normalization: trim + lower + CSV split
    * (reference: shared/config/__init__.py:64-78). */
  def normalizeCsv(c: Column): Column = split(trim(lower(c)), "\\s*,\\s*")

  /** F4 — MIME sniff from magic bytes. The reference delegates to libmagic
    * (services/file-service/main.py:103); here a magic-number prefix table
    * over the first bytes of a binary column — pure `Column` expression, so it
    * stays inside whole-stage codegen. */
  def sniffMime(content: Column): Column = {
    val head = hex(substring(content, 1, 12)) // hex uppercase
    when(head.startsWith("FFD8FF"), "image/jpeg")
      .when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("49492A00") || head.startsWith("4D4D002A"), "image/tiff")
      .when(head.startsWith("504B0304"), "application/zip")
      .when(head.startsWith("25504446"), "application/pdf")
      .when(head.startsWith("1F8B"), "application/gzip")
      // media containers (the multimodal ingest arm): RIFF....WAVE,
      // ....ftyp (ISO-BMFF box at offset 4), GIF8, BM, LASF
      .when(head.startsWith("52494646") &&
        substring(head, 17, 8) === "57415645", "audio/wav")
      .when(substring(head, 9, 8) === "66747970", "video/mp4")
      .when(head.startsWith("47494638"), "image/gif")
      .when(head.startsWith("4C415346"), "application/vnd.las")
      .when(head.startsWith("424D"), "image/bmp")
      .otherwise("application/octet-stream")
  }

  /** Business days from the epoch-Monday 1970-01-05 to `d` — the closed
    * form (weeks·5 + min(weekday, 5)) whose DIFFERENCE between two dates
    * counts Mon–Fri days in the half-open interval, the SLA-clock
    * primitive (no holiday table; that's a join away). Pure integer
    * calendar arithmetic, identical in any engine. */
  /** Luhn checksum validity of a fixed-width digit string — the payment/
    * account-number check digit (ISO/IEC 7812), the numeric sibling of the
    * q63 UUID and q62 coordinate validators. Generated as `width` explicit
    * per-position terms (digits at even distance from the right count
    * once; odd-distance digits double, minus 9 above 4) so the whole
    * check is one codegen-friendly integer expression — no UDF, no
    * explode. */
  def luhnValid(num: Column, width: Int): Column = {
    require(width >= 2, "need at least one payload digit + check digit")
    val terms = (1 to width).map { pos =>
      val d = substring(num, pos, 1).cast("int")
      val fromRight = width - pos // 0 = check digit itself
      if (fromRight % 2 == 1)
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
      else d
    }
    (length(num) === width) && (terms.reduce(_ + _) % 10 === 0)
  }

  def busDayIndex(d: Column): Column = {
    // non-negative dd (fixture dates are all after the anchor), so
    // floor(dd/7) is the exact integer quotient in both engines
    val dd = datediff(d, to_date(lit("1970-01-05"))).cast("long")
    floor(dd / lit(7)).cast("long") * 5L + least(pmod(dd, lit(7L)), lit(5L))
  }
}
