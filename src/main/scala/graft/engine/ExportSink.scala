package graft.engine

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession

/** export_data packet sink (reference E20: dbccore.py:724-829).
  *
  * Semantics mirrored:
  *  - SELECT-only guard: every statement must be a read-only query or the
  *    whole step is rejected (dbccore.py:731-738);
  *  - snapshot read: Spark parquet reads are snapshot-isolated by file
  *    listing — the REPEATABLE READ + READ ONLY txn comes for free;
  *  - streaming fetch: rows are pulled through `toLocalIterator` in
  *    10k-row batches (the reference's server-side cursor `read(10000)`,
  *    dbccore.py:744,766) — the driver never holds the full resultset;
  *  - CSV: tab-delimited, QUOTE_ALL, header row, one file per statement,
  *    named `export_<md5(stm)[0:6]>_<yyyyMMdd-HHmmss>_<target>.csv`;
  *  - zip: `use_zip` packs all CSVs into one archive and deletes them;
  *    `password: "random"` generates a 12-char password embedded in the
  *    zip FILENAME (`export_<password>_<ts>_<target>.zip`) — the
  *    reference's contract (dbccore.py:782-793, test_packets.py:586-632).
  *    With a password the archive is WinZip AES-256 (AE-2) encrypted —
  *    same format family as the reference's pyzipper WZ_AES — via
  *    [[AesZip]] (JDK crypto only); without one it is a standard zip.
  */
object ExportSink {

  final case class ExportResult(csvFiles: Seq[String], zipFile: Option[String],
      password: Option[String])

  private val TsFmt = DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss").withZone(ZoneOffset.UTC)

  /** Deterministic-seed password gen is injectable for tests; default is
    * SecureRandom over [A-Za-z0-9] ×12 (reference generate_password,
    * dbccore.py:708-715). */
  def generatePassword(rng: java.util.Random = new java.security.SecureRandom()): String = {
    val alphabet = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString
    (1 to 12).map(_ => alphabet.charAt(rng.nextInt(alphabet.length))).mkString
  }

  def exportData(spark: SparkSession, ctx: StepContext, stms: Seq[String],
      exportDir: String, meta: MetaData,
      now: () => Long = () => System.currentTimeMillis(),
      rng: java.util.Random = new java.security.SecureRandom()): ExportResult = {
    // SELECT-only guard
    val offending = stms.filterNot(SqlSplitter.isReadOnlyStatement)
    if (offending.nonEmpty)
      throw new IllegalStateException(
        s"export_data packet contains non-SELECT statement: " +
          SqlSplitter.firstKeyword(offending.head))
    Files.createDirectories(Paths.get(exportDir))
    val ts = TsFmt.format(Instant.ofEpochMilli(now()))
    val csvFiles = mutable.Buffer.empty[String]

    stms.foreach { stm =>
      val df = spark.sql(stm)
      val name = s"export_${PacketLoader.md5Hex(stm).take(6)}_${ts}_${ctx.target}.csv"
      val path = Paths.get(exportDir, name).toString
      val out = new OutputStreamWriter(
        new BufferedOutputStream(new FileOutputStream(path)), StandardCharsets.UTF_8)
      try {
        out.write(df.schema.fieldNames.map(quote).mkString("\t") + "\r\n")
        // toLocalIterator = one partition in flight on the driver; grouped
        // mirrors the reference's 10k cursor batches
        df.toLocalIterator().asScala.grouped(10000).foreach { batch =>
          batch.foreach { row =>
            // SQL NULL → empty field (the reference's csv.writer renders None
            // as ""), distinguishable from a literal 'null' string value
            out.write(row.toSeq.map(v =>
              quote(if (v == null) "" else String.valueOf(v))).mkString("\t") + "\r\n")
          }
        }
      } finally out.close()
      csvFiles += path
    }
    ctx.notice("INFO", s"export data finished: ${csvFiles.size} file(s)")

    if (meta.exportUseZip) {
      val (password, zipName) = meta.exportPassword match {
        case Some("random") =>
          val p = generatePassword(rng)
          (Some(p), s"export_${p}_${ts}_${ctx.target}.zip")
        case Some(p) => (Some(p), s"export_${ts}_${ctx.target}.zip")
        case None => (None, s"export_${ts}_${ctx.target}.zip")
      }
      val zipPath = Paths.get(exportDir, zipName).toString
      val entries = csvFiles.map { f =>
        val p = Paths.get(f)
        p.getFileName.toString -> Files.readAllBytes(p)
      }.toSeq
      password match {
        case Some(pw) => AesZip.write(zipPath, entries, pw, rng)
        case None =>
          val zos = new ZipOutputStream(
            new BufferedOutputStream(new FileOutputStream(zipPath)))
          try entries.foreach { case (name, bytes) =>
            zos.putNextEntry(new ZipEntry(name))
            zos.write(bytes)
            zos.closeEntry()
          } finally zos.close()
      }
      csvFiles.foreach(f => Files.delete(Paths.get(f)))
      ExportResult(csvFiles.toSeq, Some(zipPath), password)
    } else ExportResult(csvFiles.toSeq, None, None)
  }

  private def quote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  private implicit class RichJIterator[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
