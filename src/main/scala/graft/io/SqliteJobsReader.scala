package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal pure-Scala reader for SQLite database files (the publicly
  * documented format, sqlite.org/fileformat2.html) — S15: the reference's
  * job queue lives in `data/jobs.db`
  * (reference: src/lib/jobManager.ts:28-67), and this environment ships no
  * sqlite JDBC driver, so the engine reads the file format directly.
  *
  * Scope: read-only, table b-trees, UTF-8 databases, with overflow-page
  * chains (large `result` JSON payloads overflow a 4 KiB page). WAL
  * side-files are not replayed — read a checkpointed db, which is what the
  * reference leaves on disk (better-sqlite3 defaults to rollback journal).
  *
  * The jobs.db is driver-side bookkeeping, kilobytes in size — decoding on
  * the driver and parallelizing the resulting rows is the correct
  * distribution boundary (same judgement as the S5 pagination sources).
  */
object SqliteReader {

  /** All rows of `table`, as column-name → value maps in rowid order.
    * Values are String | Long | Double | Array[Byte] | null. */
  def readTable(path: String, table: String): (Seq[String], Seq[Seq[Any]]) = {
    val db = Files.readAllBytes(Paths.get(path))
    require(db.length >= 100 &&
      new String(db, 0, 16, "ISO-8859-1") == "SQLite format 3\u0000",
      s"$path is not a SQLite 3 database")
    val pageSize = {
      val raw = u16(db, 16)
      if (raw == 1) 65536 else raw
    }
    val reserved = db(20) & 0xff
    val usable = pageSize - reserved
    val encoding = u32(db, 56)
    require(encoding == 1, s"only UTF-8 databases supported (encoding=$encoding)")

    // sqlite_schema (page 1): columns type, name, tbl_name, rootpage, sql
    val schemaRows = walkTable(db, pageNo = 1, pageSize, usable)
    val entry = schemaRows.find(r =>
      r.values.lift(0).contains("table") && r.values.lift(1).contains(table))
      .getOrElse(throw new IllegalArgumentException(s"table $table not found in $path"))
    val rootPage = entry.values(3) match {
      case n: Long => n.toInt
      case other => throw new IllegalStateException(s"bad rootpage $other")
    }
    val columns = parseColumnNames(entry.values(4).asInstanceOf[String])
    val rows = walkTable(db, rootPage, pageSize, usable)
    (columns, rows.map { r =>
      // ragged rows (ALTER TABLE ADD COLUMN) pad with NULL like SQLite
      r.values.padTo(columns.length, null).take(columns.length)
    })
  }

  private final case class Rec(rowid: Long, values: Seq[Any])

  /** Depth-first traversal of a table b-tree → records in rowid order. */
  private def walkTable(db: Array[Byte], pageNo: Int, pageSize: Int, usable: Int): Seq[Rec] = {
    val pageStart = (pageNo - 1) * pageSize
    val headerStart = if (pageNo == 1) pageStart + 100 else pageStart
    val pageType = db(headerStart) & 0xff
    val cellCount = u16(db, headerStart + 3)
    pageType match {
      case 0x05 => // interior table: left-child pointers + rightmost
        val cellPtrs = (0 until cellCount)
          .map(i => pageStart + u16(db, headerStart + 12 + 2 * i))
        val children = cellPtrs.map(off => u32(db, off)) :+ u32(db, headerStart + 8)
        children.flatMap(child => walkTable(db, child, pageSize, usable))
      case 0x0d => // leaf table: (payloadLen varint, rowid varint, record)
        (0 until cellCount).map { i =>
          var off = pageStart + u16(db, headerStart + 8 + 2 * i)
          val (payloadLen, o1) = varint(db, off); off = o1
          val (rowid, o2) = varint(db, off); off = o2
          val payload = readPayload(db, off, payloadLen.toInt, pageSize, usable, isLeafTable = true)
          Rec(rowid, decodeRecord(payload))
        }
      case other =>
        throw new IllegalStateException(f"unexpected page type 0x$other%02x at page $pageNo")
    }
  }

  /** Local + overflow-chain payload assembly (fileformat2.html §B-tree
    * Pages: K = M + ((P−M) mod (U−4)); local = K if K ≤ X else M). */
  private def readPayload(db: Array[Byte], off: Int, total: Int,
      pageSize: Int, usable: Int, isLeafTable: Boolean): Array[Byte] = {
    val x = if (isLeafTable) usable - 35 else ((usable - 12) * 64 / 255) - 23
    if (total <= x) java.util.Arrays.copyOfRange(db, off, off + total)
    else {
      val m = ((usable - 12) * 32 / 255) - 23
      val k = m + (total - m) % (usable - 4)
      val local = if (k <= x) k else m
      val out = new Array[Byte](total)
      System.arraycopy(db, off, out, 0, local)
      var written = local
      var next = u32(db, off + local)
      while (next != 0 && written < total) {
        val pageStart = (next - 1) * pageSize
        val chunk = math.min(usable - 4, total - written)
        System.arraycopy(db, pageStart + 4, out, written, chunk)
        written += chunk
        next = u32(db, pageStart)
      }
      require(written == total, s"truncated overflow chain ($written of $total bytes)")
      out
    }
  }

  /** SQLite record: header-size varint, serial-type varints, then values. */
  private def decodeRecord(p: Array[Byte]): Seq[Any] = {
    val (headerLen, afterLen) = varint(p, 0)
    var off = afterLen
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (off < headerLen) {
      val (t, o) = varint(p, off)
      types += t
      off = o
    }
    var valOff = headerLen.toInt
    types.toSeq.map { t =>
      val (v, size) = decodeValue(p, valOff, t)
      valOff += size
      v
    }
  }

  private def decodeValue(p: Array[Byte], off: Int, serialType: Long): (Any, Int) =
    serialType match {
      case 0 => (null, 0)
      case 1 => (p(off).toLong, 1)
      case 2 => (sint(p, off, 2), 2)
      case 3 => (sint(p, off, 3), 3)
      case 4 => (sint(p, off, 4), 4)
      case 5 => (sint(p, off, 6), 6)
      case 6 => (sint(p, off, 8), 8)
      case 7 => (java.lang.Double.longBitsToDouble(sint(p, off, 8)), 8)
      case 8 => (0L, 0)
      case 9 => (1L, 0)
      case t if t >= 12 && t % 2 == 0 =>
        val n = ((t - 12) / 2).toInt
        (java.util.Arrays.copyOfRange(p, off, off + n), n)
      case t if t >= 13 =>
        val n = ((t - 13) / 2).toInt
        (new String(p, off, n, "UTF-8"), n)
      case t => throw new IllegalStateException(s"unsupported serial type $t")
    }

  /** Big-endian signed integer of `n` bytes. */
  private def sint(p: Array[Byte], off: Int, n: Int): Long = {
    var v = p(off).toLong // sign-extends
    var i = 1
    while (i < n) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
    v
  }

  /** SQLite varint: 1-9 bytes, high bit continues; 9th byte carries 8 bits. */
  private def varint(p: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = p(off + i) & 0xff
      v = (v << 7) | (b & 0x7f)
      if ((b & 0x80) == 0) return (v, off + i + 1)
      i += 1
    }
    ((v << 8) | (p(off + 8) & 0xff), off + 9)
  }

  private def u16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

  private def u32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** Column names from a CREATE TABLE statement: split the parenthesized
    * body on depth-0 commas, first identifier per segment, constraint
    * clauses (PRIMARY KEY(...), CHECK(...), ...) dropped. */
  private[io] def parseColumnNames(createSql: String): Seq[String] = {
    val body = createSql.substring(createSql.indexOf('(') + 1, createSql.lastIndexOf(')'))
    val segments = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => segments += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) segments += cur.toString
    val constraintKeywords =
      Set("primary", "unique", "check", "foreign", "constraint")
    segments.toSeq
      .map(_.trim)
      .filter(_.nonEmpty)
      .filterNot(s => constraintKeywords.contains(
        s.split("[\\s(]+", 2).head.toLowerCase))
      .map(_.split("[\\s(]+", 2).head.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("[").stripSuffix("]").stripPrefix("`").stripSuffix("`"))
  }
}

/** The S15 jobs source: a reference-produced `jobs.db` → the engine's jobs
  * DataFrame, feeding [[graft.operators.Jobs.listJobs]] unchanged. */
object SqliteJobsReader {

  val jobsSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("command", StringType),
    StructField("status", StringType),
    StructField("progress_current", LongType),
    StructField("progress_total", LongType),
    StructField("progress_message", StringType),
    StructField("result", StringType),
    StructField("error", StringType),
    StructField("created_at", TimestampType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType)))

  /** datetime('now') or Date.toISOString() text → Timestamp (both formats
    * appear in one reference-produced row — see [[SqliteTimestamps]]). */
  private def ts(v: Any): java.sql.Timestamp = v match {
    case null => null
    case s: String => java.sql.Timestamp.from(SqliteTimestamps.parse(s))
    case other => throw new IllegalArgumentException(s"bad datetime $other")
  }

  private def long(v: Any): Any = v match {
    case null => null
    case n: Long => n
    case other => throw new IllegalArgumentException(s"bad integer $other")
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val (cols, rows) = SqliteReader.readTable(path, "jobs")
    require(cols == jobsSchema.fieldNames.toSeq,
      s"unexpected jobs.db columns: $cols")
    val converted = rows.map { r =>
      Row(r(0), r(1), r(2), long(r(3)), long(r(4)), r(5), r(6), r(7),
        ts(r(8)), ts(r(9)), ts(r(10)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(converted, 1), jobsSchema)
  }
}
