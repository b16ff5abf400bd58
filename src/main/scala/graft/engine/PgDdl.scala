package graft.engine

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** PostgreSQL-DDL EMULATION for verbatim packets against graft SQL
  * tables (`conf.pgSchemaMap`, e.g. `public` → `g.db`) — the layer
  * that lets the reference's FLAGSHIP migration packet
  * (packets/test_int4_to_int8: serial seeding, trigger-guarded
  * backfill, CHECK-constraint validation, unique index, rename swap)
  * run BYTE-IDENTICAL through [[PacketRunner]]:
  *
  *   - `CREATE TABLE … (id serial, …)` → graft `CREATE TABLE`
  *     (partitioning from `conf.pgCreatePartition`; `serial` becomes an
  *     INT column fed by a per-table sequence, PG's `<t>_<c>_seq`);
  *   - `INSERT INTO t(col, …)` with a column list → missing columns
  *     fill from their sequence default (insertion-order values, PG's
  *     assignment order) or NULL, and active BEFORE INSERT triggers
  *     apply their `NEW.x := expr` assignments;
  *   - `CREATE FUNCTION … RETURNS trigger` / `CREATE TRIGGER … BEFORE
  *     INSERT … EXECUTE PROCEDURE f()` → a driver-side trigger registry
  *     (the narrow `NEW.x := NEW.y` assignment shape — the migration
  *     trigger's — parses; anything else fails loudly);
  *   - `ALTER TABLE … ADD COLUMN / RENAME / DROP COLUMN` → the graft
  *     catalog's metadata-only ALTER surface;
  *   - `ADD CONSTRAINT … CHECK (…) NOT VALID` + `VALIDATE CONSTRAINT`
  *     → a registered check validated by a real scan (violations FAIL
  *     the step — the reference's gate before the key swap);
  *   - `CREATE UNIQUE INDEX [CONCURRENTLY]` → a uniqueness scan (dupes
  *     fail loudly) + index registry; `ADD CONSTRAINT … PRIMARY KEY
  *     USING INDEX` marks the index's columns NOT NULL;
  *   - `UPDATE t a SET … FROM (sub) AS s WHERE a.k = s.k` → the
  *     equivalent `MERGE INTO` (Spark SQL has no UPDATE…FROM; the
  *     graft MERGE plans it leaf-scoped, merge-on-read when eligible);
  *   - `ALTER COLUMN … SET DEFAULT nextval('seq')` / `ALTER SEQUENCE …
  *     OWNED BY` → sequence-default registry / recorded no-op;
  *   - `ALTER TABLE … SET (reloptions)` → recorded per-table options.
  *
  * All emulation STATE (sequences, triggers, functions, constraints,
  * indexes, reloptions) lives as tiny files under `<warehouse>/_pg/`,
  * so it survives sessions alongside the tables it describes, and
  * `information_schema.columns` materializes on demand from the
  * catalog's CURRENT schemas + the NOT NULL markers
  * ([[refreshInfoSchema]] → the `dbc_info_columns` view the rewriter
  * maps the PG name onto). */
object PgDdl {

  private def strip(s: String): String = SqlSplitter.stripComments(s).trim

  /** `public.test_tbl` → `g.db.test_tbl` under the conf map. */
  private def mapRef(ref: String, m: Map[String, String]): String = {
    val parts = ref.split("\\.")
    if (parts.length == 2 && m.contains(parts(0).toLowerCase))
      m(parts(0).toLowerCase) + "." + parts(1)
    else ref
  }

  private def catalogOf(spark: SparkSession, mapped: String)
      : graft.sql.GraftCatalog =
    org.apache.spark.sql.graft.ColumnBridge
      .catalogPlugin(spark, mapped.split("\\.").head) match {
      case g: graft.sql.GraftCatalog => g
      case other => sys.error(s"PgDdl: catalog '${mapped.split("\\.")
        .head}' is ${other.getClass.getName}, not a GraftCatalog")
    }

  private def warehouseOf(spark: SparkSession,
      m: Map[String, String]): String =
    catalogOf(spark, m.values.head + ".x").warehouseDir

  private def simpleName(ref: String): String =
    ref.split("\\.").last.toLowerCase

  // ------------------------------------------------------------------
  // state files under <warehouse>/_pg/

  private def fsOf(spark: SparkSession, wh: String) =
    new HPath(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def put(spark: SparkSession, wh: String, key: String,
      content: String): Unit =
    ManifestTable.swapRefPointer(wh, s"_pg/$key", content + "\n")

  private def get(spark: SparkSession, wh: String,
      key: String): Option[String] = {
    val fs = fsOf(spark, wh)
    val p = new HPath(wh, s"_pg/$key")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  private def del(spark: SparkSession, wh: String, key: String): Unit =
    fsOf(spark, wh).delete(new HPath(wh, s"_pg/$key"), false)

  private def listKeys(spark: SparkSession, wh: String,
      prefix: String): Seq[String] = {
    val fs = fsOf(spark, wh)
    val dir = new HPath(wh, "_pg")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith(prefix) && !n.startsWith(".")).sorted
      .toSeq
  }

  /** Allocate `n` consecutive sequence values; returns the first.
    * Read-modify-write under the warehouse publish lock — concurrent
    * PG-DDL inserters (the flagship's live-writer race) must never be
    * handed overlapping ranges. */
  private def fetchAdd(spark: SparkSession, wh: String, seq: String,
      n: Long): Long = ManifestTable.withPublishLock(wh) {
    val cur = get(spark, wh, s"seq_$seq").map(_.toLong).getOrElse(1L)
    put(spark, wh, s"seq_$seq", (cur + n).toString)
    cur
  }

  // ------------------------------------------------------------------
  // classification

  private val Kws = Set("create", "drop", "alter", "insert", "update")

  /** True when this raw PG statement belongs to the emulation layer:
    * a DDL/DML keyword plus a reference into a mapped schema. */
  def handles(stm: String, m: Map[String, String]): Boolean = {
    if (m.isEmpty) return false
    val s = strip(stm)
    val kw = SqlSplitter.firstKeyword(s).toLowerCase
    if (!Kws.contains(kw)) return false
    val schemas = m.keys.map(java.util.regex.Pattern.quote).mkString("|")
    val refs = s"(?is).*\\b($schemas)\\s*\\.\\s*\\w+.*".r.matches(s)
    // UPDATE…FROM and plain INSERT-with-collist are ours; a plain
    // UPDATE/DELETE on a mapped table passes through to the catalog —
    // the FROM must be a TOP-LEVEL clause after the SET list ('from'
    // inside a string literal or a scalar subquery in SET belongs to
    // the normal catalog UPDATE path)
    kw match {
      case "update" => refs && hasTopLevelUpdateFrom(s)
      case "insert" => refs &&
        "(?is)^insert\\s+into\\s+[\\w\\.]+\\s*\\(.*".r.matches(s)
      case _ => refs
    }
  }

  /** True when an UPDATE statement carries a top-level FROM clause
    * (outside string literals and parens, after the SET keyword) —
    * the PG `UPDATE … SET … FROM …` shape this layer rewrites to
    * MERGE. */
  private def hasTopLevelUpdateFrom(s: String): Boolean = {
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    var depth = 0
    var seenSet = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case '"' =>
          i += 1
          while (i < s.length && s.charAt(i) != '"') i += 1
        // SQL comments may carry keyword-shaped text ('-- from ...'):
        // skip them like string literals, or a plain UPDATE would be
        // misrouted to the MERGE rewrite path
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < s.length &&
              !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i += 1 // lands on '/', the loop's i += 1 steps past it
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && isWordChar(c) &&
            (i == 0 || !isWordChar(s.charAt(i - 1))) =>
          var j = i
          while (j < s.length && isWordChar(s.charAt(j))) j += 1
          s.substring(i, j).toLowerCase match {
            case "set" => seenSet = true
            case "from" if seenSet => return true
            case _ =>
          }
          i = j - 1
        case _ =>
      }
      i += 1
    }
    false
  }

  // ------------------------------------------------------------------
  // execution

  def execute(spark: SparkSession, m: Map[String, String],
      createPartition: Map[String, String], stm: String,
      notice: String => Unit): Unit = {
    val s = strip(stm).stripSuffix(";").trim
    val wh = warehouseOf(spark, m)

    def run(sql: String): DataFrame =
      spark.sql(PgDialectRewriter.withTableMap(m)(
        PgDialectRewriter.rewrite(sql)))

    // CREATE TABLE <t> ( cols )
    val createTable =
      "(?is)^create\\s+table\\s+([\\w\\.]+)\\s*\\((.*)\\)\\s*$".r
    // DROP TABLE [IF EXISTS] <t>
    val dropTable =
      "(?is)^drop\\s+table\\s+(if\\s+exists\\s+)?([\\w\\.]+)\\s*$".r
    val insertInto =
      "(?is)^insert\\s+into\\s+([\\w\\.]+)\\s*\\(([^)]*)\\)\\s*(.*)$".r
    val createFunc =
      ("(?is)^create\\s+function\\s+([\\w\\.]+)\\s*\\(\\s*\\)\\s*" +
        "returns\\s+trigger\\b.*?as\\s+(\\$[\\w]*\\$)(.*)\\2\\s*;?\\s*$").r
    val dropFunc =
      "(?is)^drop\\s+function\\s+(if\\s+exists\\s+)?([\\w\\.]+)\\s*\\(\\s*\\)\\s*$".r
    val createTrigger =
      ("(?is)^create\\s+trigger\\s+(\\w+)\\s+before\\s+insert\\s+on\\s+" +
        "([\\w\\.]+)\\s+for\\s+each\\s+row\\s+execute\\s+" +
        "(?:procedure|function)\\s+([\\w\\.]+)\\s*\\(\\s*\\)\\s*$").r
    val dropTrigger =
      "(?is)^drop\\s+trigger\\s+(\\w+)\\s+on\\s+([\\w\\.]+)\\s*$".r
    val alterSet =
      "(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+set\\s*\\((.*)\\)\\s*$".r
    val addColumn =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+add\\s+column\\s+" +
        "(\\w+)\\s+([\\w ()]+?)\\s*$").r
    val addCheck =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+add\\s+constraint\\s+" +
        "(\\w+)\\s+check\\s*\\((.*)\\)\\s*(not\\s+valid)?\\s*$").r
    val validate =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+validate\\s+" +
        "constraint\\s+(\\w+)\\s*$").r
    val addPkUsing =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+add\\s+constraint\\s+" +
        "(\\w+)\\s+primary\\s+key\\s+using\\s+index\\s+(\\w+)\\s*$").r
    val renameCol =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+rename\\s+(?:column\\s+)?" +
        "(\\w+)\\s+to\\s+(\\w+)\\s*$").r
    val setDefaultSeq =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+alter\\s+column\\s+" +
        "(\\w+)\\s+set\\s+default\\s+nextval\\s*\\(\\s*'([\\w\\.]+)'" +
        "(?:\\s*::\\s*regclass)?\\s*\\)\\s*$").r
    val dropColumn =
      ("(?is)^alter\\s+table\\s+([\\w\\.]+)\\s+drop\\s+column\\s+" +
        "(\\w+)\\s*$").r
    val alterSeq = "(?is)^alter\\s+sequence\\s+([\\w\\.]+)\\s+(.*)$".r
    val createIndex =
      ("(?is)^create\\s+(unique\\s+)?index\\s+(?:concurrently\\s+)?" +
        "(\\w+)\\s+on\\s+([\\w\\.]+)\\s*(?:using\\s+\\w+\\s*)?" +
        "\\(([^)]*)\\)\\s*$").r
    val updateFrom =
      ("(?is)^update\\s+([\\w\\.]+)\\s+(\\w+)\\s+set\\s+(.*?)\\s+" +
        "from\\s*\\((.*)\\)\\s+as\\s+(\\w+)\\s+where\\s+(.*)$").r

    s match {
      case createTable(ref, colsText) =>
        val mapped = mapRef(ref, m)
        val tbl = simpleName(ref)
        val part = createPartition.getOrElse(tbl,
          createPartition.getOrElse("*", sys.error(
            s"PgDdl: CREATE TABLE $ref needs a partition clause - set " +
              s"RunnerConf.pgCreatePartition(\"$tbl\")")))
        val cols = splitTop(colsText).map { c =>
          val bits = c.trim.split("\\s+", 2)
          (bits(0), bits.lift(1).getOrElse("").trim)
        }
        val rendered = cols.map { case (name, ty) =>
          ty.toLowerCase.replaceAll("\\s+", " ") match {
            case "serial" =>
              val seq = s"${tbl}_${name}_seq"
              put(spark, wh, s"seq_$seq", "1")
              put(spark, wh, s"seqdefault_$tbl", s"$name\t$seq")
              s"$name INT"
            case "bigserial" =>
              val seq = s"${tbl}_${name}_seq"
              put(spark, wh, s"seq_$seq", "1")
              put(spark, wh, s"seqdefault_$tbl", s"$name\t$seq")
              s"$name BIGINT"
            case t => s"$name ${pgType(t)}"
          }
        }
        spark.sql(s"CREATE TABLE $mapped (${rendered.mkString(", ")}) " +
          s"PARTITIONED BY ($part)")
        notice(s"PgDdl: created $mapped PARTITIONED BY ($part)")
      case dropTable(_, ref) =>
        val tbl = simpleName(ref)
        spark.sql(s"DROP TABLE IF EXISTS ${mapRef(ref, m)}")
        (listKeys(spark, wh, s"seqdefault_$tbl") ++
          listKeys(spark, wh, s"seq_${tbl}_") ++
          listKeys(spark, wh, s"cons_${tbl}_") ++
          listKeys(spark, wh, s"notnull_${tbl}_") ++
          listKeys(spark, wh, s"idx_${tbl}_") ++
          listKeys(spark, wh, s"opt_${tbl}_") ++
          listKeys(spark, wh, "trig_").filter(tk =>
            get(spark, wh, tk).exists(_.split("\t")(0) == tbl)))
          .foreach(del(spark, wh, _))
      case insertInto(ref, colList, rest) =>
        insertWithDefaults(spark, m, wh, ref, colList, rest, run)
      case createFunc(name, _, body) =>
        val assigns = parseTriggerBody(body)
        put(spark, wh, s"func_${simpleName(name)}",
          assigns.map { case (c, e) => s"$c\t$e" }.mkString("\n"))
        notice(s"PgDdl: registered trigger function ${simpleName(name)}")
      case dropFunc(_, name) =>
        del(spark, wh, s"func_${simpleName(name)}")
      case createTrigger(name, ref, func) =>
        put(spark, wh, s"trig_$name",
          s"${simpleName(ref)}\t${simpleName(func)}")
        notice(s"PgDdl: trigger $name BEFORE INSERT ON ${simpleName(ref)}")
      case dropTrigger(name, _) =>
        del(spark, wh, s"trig_$name")
      case addColumn(ref, colName, ty) =>
        spark.sql(s"ALTER TABLE ${mapRef(ref, m)} ADD COLUMN " +
          s"$colName ${pgType(ty.toLowerCase.trim)}")
      case addCheck(ref, name, expr, _) =>
        put(spark, wh, s"cons_${simpleName(ref)}_$name",
          s"$expr\tnot_validated")
        notice(s"PgDdl: constraint $name recorded NOT VALID")
      case validate(ref, name) =>
        val tbl = simpleName(ref)
        val expr = get(spark, wh, s"cons_${tbl}_$name").map(_.split("\t")(0))
          .getOrElse(sys.error(s"PgDdl: no constraint $name on $tbl"))
        val bad = run(s"SELECT count(*) AS n FROM ${mapRef(ref, m)} " +
          s"WHERE NOT coalesce(($expr), true)").head().getLong(0)
        if (bad > 0) throw new IllegalStateException(
          s"PgDdl: VALIDATE CONSTRAINT $name failed - $bad row(s) " +
            s"violate ($expr)")
        put(spark, wh, s"cons_${tbl}_$name", s"$expr\tvalidated")
        "(?i)^\\s*(\\w+)\\s+is\\s+not\\s+null\\s*$".r
          .findFirstMatchIn(expr)
          .foreach(mm => put(spark, wh,
            s"notnull_${tbl}_${mm.group(1).toLowerCase}", "1"))
        notice(s"PgDdl: constraint $name validated (0 violations)")
      case addPkUsing(ref, name, idx) =>
        val tbl = simpleName(ref)
        val cols = get(spark, wh, s"idx_${tbl}_$idx").getOrElse(
          sys.error(s"PgDdl: no index $idx on $tbl"))
        val nulls = run(s"SELECT count(*) AS n FROM ${mapRef(ref, m)} " +
          s"WHERE ${cols.split(",").map(c => s"$c IS NULL")
            .mkString(" OR ")}").head().getLong(0)
        if (nulls > 0) throw new IllegalStateException(
          s"PgDdl: PRIMARY KEY $name: $nulls NULL key row(s)")
        cols.split(",").map(_.trim).foreach(c =>
          put(spark, wh, s"notnull_${tbl}_${c.toLowerCase}", "1"))
        notice(s"PgDdl: primary key $name on $tbl($cols) via $idx")
      case renameCol(ref, from, to) =>
        val tbl = simpleName(ref)
        spark.sql(s"ALTER TABLE ${mapRef(ref, m)} RENAME COLUMN " +
          s"$from TO $to")
        // registry markers follow the column
        get(spark, wh, s"notnull_${tbl}_${from.toLowerCase}").foreach {
          _ =>
            del(spark, wh, s"notnull_${tbl}_${from.toLowerCase}")
            put(spark, wh, s"notnull_${tbl}_${to.toLowerCase}", "1")
        }
        get(spark, wh, s"seqdefault_$tbl").foreach { v =>
          val Array(c, seq) = v.split("\t", 2)
          if (c.equalsIgnoreCase(from))
            put(spark, wh, s"seqdefault_$tbl", s"$to\t$seq")
        }
      case setDefaultSeq(ref, colName, seq) =>
        put(spark, wh, s"seqdefault_${simpleName(ref)}",
          s"$colName\t${simpleName(seq)}")
      case dropColumn(ref, colName) =>
        val tbl = simpleName(ref)
        spark.sql(s"ALTER TABLE ${mapRef(ref, m)} DROP COLUMN $colName")
        del(spark, wh, s"notnull_${tbl}_${colName.toLowerCase}")
        get(spark, wh, s"seqdefault_$tbl").foreach { v =>
          if (v.split("\t")(0).equalsIgnoreCase(colName))
            del(spark, wh, s"seqdefault_$tbl")
        }
      case alterSet(ref, opts) =>
        val tbl = simpleName(ref)
        splitTop(opts).foreach { kv =>
          val Array(k, v) = kv.split("=", 2).map(_.trim)
          put(spark, wh, s"opt_${tbl}_$k", v)
        }
        notice(s"PgDdl: reloptions recorded for $tbl ($opts)")
      case alterSeq(seq, rest) =>
        notice(s"PgDdl: ALTER SEQUENCE ${simpleName(seq)} " +
          s"${rest.take(40)}… recorded as a no-op")
      case createIndex(unique, name, ref, colsText) =>
        val tbl = simpleName(ref)
        val cols = splitTop(colsText).map(_.trim)
        if (unique != null) {
          val dupes = run(s"SELECT count(*) AS n FROM (SELECT " +
            s"${cols.mkString(", ")} FROM ${mapRef(ref, m)} " +
            s"GROUP BY ${cols.mkString(", ")} HAVING count(*) > 1) d")
            .head().getLong(0)
          if (dupes > 0) throw new IllegalStateException(
            s"PgDdl: CREATE UNIQUE INDEX $name: $dupes duplicate " +
              s"key group(s) on (${cols.mkString(",")})")
        }
        put(spark, wh, s"idx_${tbl}_$name", cols.mkString(","))
        notice(s"PgDdl: index $name on $tbl(${cols.mkString(",")})" +
          (if (unique != null) " UNIQUE (validated)" else ""))
      case updateFrom(ref, alias, assigns, sub, salias, cond) =>
        val merge = s"MERGE INTO ${mapRef(ref, m)} $alias USING " +
          s"($sub) $salias ON $cond WHEN MATCHED THEN UPDATE SET $assigns"
        run(merge)
      case other => sys.error(
        s"PgDdl: unsupported statement shape: ${other.take(160)}")
    }
  }

  /** INSERT with an explicit column list: missing columns fill from
    * their sequence default (insertion-order values) or NULL, BEFORE
    * INSERT triggers apply, and the rows land through the catalog. */
  private def insertWithDefaults(spark: SparkSession,
      m: Map[String, String], wh: String, ref: String, colList: String,
      rest: String, run: String => DataFrame): Unit = {
    val mapped = mapRef(ref, m)
    val tbl = simpleName(ref)
    val listed = colList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val schema = spark.table(mapped).schema
    var df = run(rest).toDF(listed: _*)
    val missing = schema.filterNot(f => listed.exists(
      _.equalsIgnoreCase(f.name)))
    val seqDefault: Option[(String, String)] =
      get(spark, wh, s"seqdefault_$tbl").map { v =>
        val Array(c, q) = v.split("\t", 2); (c, q) }
    missing.foreach { f =>
      seqDefault match {
        case Some((c, seq)) if c.equalsIgnoreCase(f.name) =>
          val cnt = df.count()
          val start = fetchAdd(spark, wh, seq, cnt)
          val withSeq = df.rdd.zipWithIndex().map { case (r, i) =>
            Row.fromSeq(r.toSeq :+ (f.dataType match {
              case IntegerType => (start + i).toInt
              case LongType => start + i
              case t => sys.error(s"PgDdl: serial column ${f.name} " +
                s"has non-integral type $t")
            }))
          }
          df = spark.createDataFrame(withSeq,
            StructType(df.schema.fields :+ f.copy(nullable = true)))
        case _ =>
          df = df.withColumn(f.name,
            org.apache.spark.sql.functions.lit(null).cast(f.dataType))
      }
    }
    // BEFORE INSERT triggers on this table, in name order
    listKeys(spark, wh, "trig_").foreach { tk =>
      get(spark, wh, tk).foreach { v =>
        val Array(onTbl, func) = v.split("\t", 2)
        if (onTbl == tbl) {
          val body = get(spark, wh, s"func_$func").getOrElse(sys.error(
            s"PgDdl: trigger ${tk.stripPrefix("trig_")} names missing " +
              s"function $func"))
          body.split("\n").filter(_.nonEmpty).foreach { line =>
            val Array(c, e) = line.split("\t", 2)
            df = df.withColumn(c, org.apache.spark.sql.functions.expr(e))
          }
        }
      }
    }
    val buf = s"dbc_pg_insert_buf_$tbl"
    df.select(schema.fieldNames.toSeq.map(
      org.apache.spark.sql.functions.col): _*)
      .createOrReplaceTempView(buf)
    spark.sql(s"INSERT INTO $mapped SELECT * FROM $buf")
  }

  /** `NEW.x := <expr>;` assignment lines of a trigger function body
    * (expressions over NEW.<col> become expressions over the row). */
  private def parseTriggerBody(body: String): Seq[(String, String)] = {
    val cleaned = SqlSplitter.stripComments(body)
    val assigns = "(?is)NEW\\.(\\w+)\\s*:=\\s*([^;]+);".r
      .findAllMatchIn(cleaned).map(mm =>
        (mm.group(1), mm.group(2).trim.replaceAll("(?i)NEW\\.", "")))
      .toSeq
    require(assigns.nonEmpty,
      s"PgDdl: trigger function body has no NEW.x := … assignment: " +
        body.take(160))
    val residue = "(?is)NEW\\.\\w+\\s*:=\\s*[^;]+;".r
      .replaceAllIn(cleaned, "")
      .replaceAll("(?is)\\b(begin|end|return\\s+new)\\b", "")
      .replaceAll("[;\\s]", "")
    require(residue.isEmpty,
      s"PgDdl: unsupported trigger body beyond NEW.x := … " +
        s"assignments: ${residue.take(80)}")
    assigns
  }

  /** Materialize `dbc_info_columns` (the rewriter's target for
    * `information_schema.columns`) from the catalog's CURRENT schemas
    * plus the NOT NULL markers. */
  def refreshInfoSchema(spark: SparkSession,
      m: Map[String, String]): Unit = {
    val wh = warehouseOf(spark, m)
    val rows = m.toSeq.flatMap { case (pgSchema, nsPath) =>
      val parts = nsPath.split("\\.")
      val cat = catalogOf(spark, nsPath + ".x")
      cat.listTables(parts.tail).toSeq.flatMap { ident =>
        val tbl = ident.name()
        val schema = spark.table(s"$nsPath.$tbl").schema
        schema.fields.toSeq.map { f =>
          val nn = get(spark, wh,
            s"notnull_${tbl}_${f.name.toLowerCase}").isDefined
          Row(pgSchema, tbl, f.name, if (nn) "NO" else "YES")
        }
      }
    }
    val sch = new StructType()
      .add("table_schema", "string").add("table_name", "string")
      .add("column_name", "string").add("is_nullable", "string")
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), sch)
      .createOrReplaceTempView("dbc_info_columns")
  }

  /** Split on top-level commas (outside parens and quotes). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def pgType(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ") match {
      case "text" | "varchar" | "character varying" => "STRING"
      case "int4" | "integer" | "int" => "INT"
      case "int8" | "bigint" => "BIGINT"
      case "int2" | "smallint" => "SMALLINT"
      case "float8" | "double precision" => "DOUBLE"
      case "float4" | "real" => "FLOAT"
      case "bool" | "boolean" => "BOOLEAN"
      case "date" => "DATE"
      case "timestamp" | "timestamptz" |
           "timestamp with time zone" => "TIMESTAMP"
      case other => other.toUpperCase // numeric(p,s), decimal, …
    }
}
