package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine-deterministic building blocks (SURVEY.md §2D H1-H6).
  *
  * Every declared query's result must hash-match a DuckDB oracle run on the
  * same parquet. The hazards and the mitigations used here:
  *
  *  - H1: `hash()` is engine-private → all digests are md5 over canonical
  *    strings; order-independent sums use the leading 48 bits of the md5
  *    re-interpreted as an integer (integer math is exact in both engines).
  *  - H2: double→string formatting differs between engines → doubles are
  *    never cast to string directly; money-grid doubles go through
  *    DECIMAL(18,2) first (both engines render scale-padded "123.40").
  *  - H3: float sums are partition-order dependent → sums are computed over
  *    exact DECIMAL and cast back to DOUBLE at the end; averages are
  *    exact-decimal-sum / count.
  *  - H4: `to_json` spacing/key-order differs → envelope JSON is built with
  *    explicit concat of '"k":v' pieces.
  *  - H5: timestamps are compared as `unix_micros` BIGINT, never strings.
  *  - H6: every query ends in a total ORDER BY over a unique key chain.
  *
  * Scale note (100 TB): all helpers are pure `Column` expressions — they
  * stay inside whole-stage codegen and put no work on the driver. The
  * decimal sums are Spark's native `Sum(Decimal)` with partial (map-side)
  * aggregation; exactness costs no extra shuffle.
  */
object Canonical {
  /** NULL sentinel + field separator for row canonicalization. Control
    * chars cannot appear in the data, so `('a,b','')` vs `('a','b')`
    * collisions (reference bug B1, duckdb_cdc.go:171-173) are impossible.
    */
  val NullMark = "\u0001"
  val Sep      = "\u0002"

  /** Exact sum of a 2-decimal-grid double column, returned as DOUBLE.
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum at 6-decimal precision for derived per-row products (e.g.
    * price*(1-disc), a 4-dp quantity). DuckDB: DECIMAL(27,6). */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(27, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count (DuckDB mirror:
    * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Leading `nHex` hex digits (4·nHex bits) of md5(s) as a non-negative
    * LongType. Callers choose the width so downstream integer sums stay
    * inside signed-64 range. DuckDB mirror:
    * ('0x' || substr(md5(s), 1, nHex))::BIGINT. */
  def md5LongHex(c: Column, nHex: Int): Column =
    conv(substring(md5(c), 1, nHex), 16, 10).cast(LongType)

  /** 48-bit md5 digest: safe to SUM over ~30k rows (2^48 · 2^15 = 2^63).
    * Beyond that, mod-reduce or partition first; see tableChecksum. */
  def md5Long48(c: Column): Column = md5LongHex(c, 12)

  /** Canonical string form of one column, engine-portable:
    *  - DOUBLE → DECIMAL(18,2) → string (scale-padded, identical renders)
    *  - TIMESTAMP → epoch micros → string
    *  - everything else → plain cast to string
    * NULL → NullMark (distinct from empty string).
    *
    * GRID ASSUMPTION: the DECIMAL(18,2) route is only correct for money-grid
    * doubles (exact 2-decimal values, |x| < 1e16) — it exists so Spark and
    * DuckDB render the same string (H2). A sub-0.01 difference disappears and
    * |x| >= 1e16 overflows the cast (ANSI error). Use this ONLY for
    * oracle-compared queries over known money columns; generic digests over
    * arbitrary tables must use [[canonColExact]]. */
  def canonCol(c: Column, dt: DataType): Column = {
    val s = dt match {
      case DoubleType    => c.cast(DecimalType(18, 2)).cast(StringType)
      case FloatType     => c.cast(DecimalType(18, 2)).cast(StringType)
      case TimestampType => unix_micros(c).cast(StringType)
      case _             => c.cast(StringType)
    }
    coalesce(s, lit(NullMark))
  }

  /** The same canonicalization spelled in DuckDB SQL, for oracle strings. */
  def canonColSql(name: String, dt: DataType): String = dt match {
    case DoubleType | FloatType =>
      s"coalesce(CAST(CAST($name AS DECIMAL(18,2)) AS VARCHAR), chr(1))"
    case TimestampType =>
      s"coalesce(CAST(epoch_us($name) AS VARCHAR), chr(1))"
    case _ => s"coalesce(CAST($name AS VARCHAR), chr(1))"
  }

  /** Lossless canonical form for the generic CDC digest path (no DuckDB
    * mirror — this surface is never oracle-compared):
    *  - DOUBLE/FLOAT → plain string cast: Java's shortest-round-trip
    *    rendering is full-precision and deterministic, so ANY bit-level
    *    change (including sub-0.01 deltas the reference would catch) alters
    *    the digest, and no magnitude overflows (NaN/Infinity render too);
    *  - BINARY → hex (a raw UTF-8 reinterpret could collide);
    *  - TIMESTAMP → epoch micros, as in [[canonCol]].
    * Assumes a flat schema (the snapshot-drop surface); nested types would
    * need to_json here. */
  def canonColExact(c: Column, dt: DataType): Column = {
    val s = dt match {
      case TimestampType => unix_micros(c).cast(StringType)
      case BinaryType    => hex(c)
      case _             => c.cast(StringType)
    }
    coalesce(s, lit(NullMark))
  }

  /** Canonical one-string form of an entire row (schema-driven, mirrors the
    * reference's reflect-then-generate pattern, duckdb_cdc.go:168-173, but
    * producing Columns instead of SQL text). Money-grid form — see the
    * [[canonCol]] grid assumption; generic tables use [[rowCanonExact]]. */
  def rowCanon(df: DataFrame): Column =
    concat_ws(Sep, df.schema.fields.map(f => canonCol(col(f.name), f.dataType)).toIndexedSeq: _*)

  /** Row canonicalization for arbitrary user tables (lossless doubles). */
  def rowCanonExact(df: DataFrame): Column =
    concat_ws(Sep, df.schema.fields.map(f => canonColExact(col(f.name), f.dataType)).toIndexedSeq: _*)

  /** Modulus for summable row digests: each term < 2^30, so a signed-64
    * SUM holds ~2^33 (8.6 B) rows without overflow — which would THROW
    * under Spark 4's default ANSI mode, not wrap. DuckDB mirror:
    * ('0x' || substr(md5(s), 1, 12))::BIGINT % 1000000007. */
  val DigestMod = 1000000007L

  /** Per-row digest; order-independent table digest = SUM of these.
    * Faithful to the reference's count+sum(hash) scheme
    * (duckdb_cdc.go:175-183) but engine-portable (H1) and overflow-safe
    * at 100 TB row counts (mod-reduced, see DigestMod). Money-grid
    * canonicalization — only for oracle-compared queries. */
  def rowDigest48(df: DataFrame): Column =
    md5Long48(rowCanon(df)) % DigestMod

  /** Per-row digest over the lossless canonical form — the generic CDC
    * change-detection digest (full double precision, like the reference's
    * hash over raw values, duckdb_cdc.go:178). */
  def rowDigestExact(df: DataFrame): Column =
    md5Long48(rowCanonExact(df)) % DigestMod

  /** FULL-WIDTH md5 of the lossless canonical row, for per-key EQUALITY
    * comparison (diff-mode CDC state). The summable mod-reduced form
    * above carries only ~2^30 entropy — fine for a table-level SUM, but
    * compared row-vs-row a changed row whose old/new digests collide
    * would be silently dropped as unchanged, and at 100 TB change
    * volumes a 1e-9 per-row event is an expected one. 128 bits makes the
    * collision class physically negligible. */
  def rowMd5Exact(df: DataFrame): Column = md5(rowCanonExact(df))
}
