package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}

/** SQL statement surface over TxLog tables (SURVEY.md §2.1 row S49,
  * round-11) — the r10 verdict's What's-missing #4 second half: time
  * travel and DESCRIBE HISTORY existed only as code-level APIs
  * (`TxLog.snapshot(v)` / `TxLog.txlogHistory`); a MySQL-migration user
  * writes STATEMENTS. Two forms:
  *
  *   `SELECT … FROM <name> VERSION AS OF <v> …`  — parsed by SPARK'S OWN
  *     parser into `RelationTimeTravel` nodes (the Delta/Iceberg v2
  *     syntax); this module is the execution layer the v1 session
  *     catalog lacks: each travel spec is validated against the parse
  *     tree (never regex-guessed — the node carries the relation and the
  *     version literal), bound to a snapshot-backed temp view, and the
  *     statement re-executes against the bound views.
  *
  *   `DESCRIBE HISTORY <name>`  — Delta's audit statement (not Spark
  *     grammar, so routed before the parser): per-version op / row count
  *     / row delta from log METADATA alone, zero data-file reads.
  *
  * The rewrite is PARSE-GUIDED text substitution: the statement is first
  * parsed, every `RelationTimeTravel` is collected (round-12: both
  * `VERSION AS OF <int>` and `TIMESTAMP AS OF '<literal>'` — the latter
  * binds to the greatest stamped commit <= t via TxLog.versionAt;
  * non-literal expressions are rejected with the reason), and only the
  * exact spans the parser confirmed are substituted. `table_changes(
  * 't', v1, v2)` — Delta's CDF table-valued function — rewrites to a
  * changeFeed-backed view the same segment-aware way. Dataset-of-LogicalPlan construction is private[sql], so
  * executing the TRANSFORMED TREE directly is not available to a library;
  * re-parsing the bound text through spark.sql keeps every downstream
  * step (analysis, optimization) on the public path. Same module
  * discipline as Dml (S39): a restricted, declared statement surface on
  * Spark's parser, not a homegrown grammar.
  *
  * Scale: binding a view is metadata-only (the snapshot resolves the live
  * file set from the log — driver-side, bytes per commit); the query
  * itself is an ordinary pruned parquet scan of the version's immutable
  * files.
  */
object TxSql {
  import org.apache.spark.sql.functions._

  private val registered =
    scala.collection.concurrent.TrieMap.empty[String, File]

  /** Register a TxLog table directory under a statement-addressable name. */
  def register(name: String, table: File): Unit = {
    registered(name.toLowerCase) = table
    ()
  }

  private val showPartitionsRe =
    """(?is)^\s*SHOW\s+PARTITIONS\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val showCreateRe =
    """(?is)^\s*SHOW\s+CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val vacuumDryRe =
    ("""(?is)^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)\s+RETAIN\s+""" +
      """VERSION\s+(\d+)\s+DRY\s+RUN\s*;?\s*$""").r
  private val showTblPropsRe =
    """(?is)^\s*SHOW\s+TBLPROPERTIES\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val explainRe =
    """(?is)^\s*EXPLAIN(?:\s+(EXTENDED|FORMATTED|CODEGEN|COST))?\s+(\S.*)$""".r
  private val describeRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val describeDetailRe =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val optimizeZRe =
    ("""(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ZORDER\s+BY\s*""" +
      """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)""" +
      """\s*\)\s*;?\s*$""").r
  private val optimizeRe =
    """(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val optimizeWhereRe =
    ("""(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*=\s*""" +
      """(?:'([^']*)'|([A-Za-z0-9_.\-]+))\s*;?\s*$""").r
  private val alterRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+""" +
      """COLUMNS\s*\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val renameColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+RENAME\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""").r
  private val dropColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""").r
  private val widenColRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ALTER\s+""" +
      """COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TYPE\s+""" +
      """([A-Za-z]+)\s*;?\s*$""").r
  private val vacuumRe =
    ("""(?is)^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)\s+RETAIN\s+""" +
      """VERSION\s+(\d+)\s*;?\s*$""").r
  private val restoreRe =
    ("""(?is)^\s*RESTORE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+""" +
      """VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val insertOverwriteRe =
    ("""(?is)^\s*INSERT\s+OVERWRITE\s+([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """(SELECT\b.+?)\s*;?\s*$""").r
  private val addConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+""" +
      """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*""" +
      """\(\s*(.+?)\s*\)\s*;?\s*$""").r
  private val dropConstraintRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+""" +
      """CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""").r
  private val cloneRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SHALLOW\s+""" +
      """CLONE\s+([A-Za-z_][A-Za-z0-9_]*)""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""").r
  private val bloomCreateRe =
    ("""(?is)^\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+COLUMNS\s*""" +
      """\(\s*([A-Za-z_][A-Za-z0-9_]*)""" +
      """(?:\s+OPTIONS\s*\(\s*bits\s*=\s*(\d+)\s*,\s*k\s*=\s*(\d+)""" +
      """\s*\))?\s*\)\s*;?\s*$""").r
  private val bloomDropRe =
    ("""(?is)^\s*DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?""" +
      """([A-Za-z_][A-Za-z0-9_]*)\s+FOR\s+COLUMNS\s*""" +
      """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*;?\s*$""").r
  private val copyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+FROM\s+""" +
      """'([^']+)'\s+FILEFORMAT\s*=\s*PARQUET\s*;?\s*$""").r
  private val createTableRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s*""" +
      """\(\s*(.+?)\s*\)\s+USING\s+graft""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*([A-Za-z0-9_,\s]+?)\s*\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""").r
  private val ctasRe =
    ("""(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """USING\s+graft""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*([A-Za-z0-9_,\s]+?)\s*\))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s+AS\s+(SELECT\b.+?)\s*;?\s*$""").r
  private val insertIntoRe =
    ("""(?is)^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+""" +
      """((?:SELECT|VALUES|WITH|TABLE)\b.+?)\s*;?\s*$""").r

  /** Managed-table root for CREATE TABLE without LOCATION: pid-scoped
    * so demo/test JVMs never collide; deployments pass LOCATION.
    */
  private def managedDir(name: String): File =
    new File(new File(new File(sys.props("java.io.tmpdir")),
      s"graft_sql_tables_${ProcessHandle.current.pid}"), name)

  private def partColsOf(s: String): Seq[String] =
    Option(s).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  /** Execute one statement: DESCRIBE HISTORY, OPTIMIZE [ZORDER BY], or a
    * SELECT with VERSION AS OF over registered TxLog tables.
    */
  def sql(spark: SparkSession, text: String): DataFrame = text match {
    case showPartitionsRe(name) =>
      showPartitions(spark, name, tableOf(name))
    case showCreateRe(name) =>
      showCreateTable(spark, name, tableOf(name))
    case vacuumDryRe(name, v) =>
      // DRY RUN precedes the destructive form: the candidate list a
      // real VACUUM at this horizon would reclaim, one row per path,
      // nothing touched — the operator's pre-flight.
      import spark.implicits._
      TxLog.vacuumPreview(tableOf(name), v.toLong).sorted
        .toDF("path_deletable")
    case showTblPropsRe(name) =>
      showTblProperties(spark, name, tableOf(name))
    case explainRe(mode, inner) =>
      // EXPLAIN [EXTENDED|FORMATTED|CODEGEN|COST] <select>: bind
      // registered names (and any travel clauses / table_changes spans)
      // exactly as the statement itself would, then let Spark's own
      // EXPLAIN render the plan — the BI-tool "what will this cost"
      // statement, zero data reads. The INNER statement is bound
      // separately because ExplainCommand keeps its plan out of the
      // parse tree's children (a travel clause inside it would be
      // invisible to the tree collect).
      val prefix = "EXPLAIN" + Option(mode).map(" " + _.trim.toUpperCase)
        .getOrElse("")
      if (inner.matches(
          "(?is).*\\b(VERSION|TIMESTAMP)\\s+AS\\s+OF\\b.*") ||
          inner.matches("(?is).*\\btable_changes\\s*\\(.*"))
        spark.sql(prefix + " " + bindAsOfText(spark, inner))
      else bindRegistered(spark, prefix + " " + inner)
    case describeRe(name) => describeHistory(spark, tableOf(name))
    case describeDetailRe(name) => describeDetail(spark, name, tableOf(name))
    case optimizeZRe(name, c1, c2) =>
      optSummary(spark, name,
        TxLog.optimizeZorder(spark, tableOf(name), Seq(c1, c2),
          targetFiles = 8), s"zorder($c1, $c2)")
    case optimizeRe(name) =>
      optSummary(spark, name,
        TxLog.compact(spark, tableOf(name), targetFiles = 8), "compact")
    case optimizeWhereRe(name, colName, strVal, bareVal) =>
      // OPTIMIZE t WHERE <partition-col> = <value>: partition-scoped
      // compaction (Delta's partition predicate) — only the selected
      // partition's files rewrite; partition dir values compare as the
      // STRINGS the layout wrote (`_p_` dirs cast to string)
      val v = Option(strVal).getOrElse(bareVal)
      optSummary(spark, name,
        TxLog.compactWhere(spark, tableOf(name),
          m => m.get(colName).contains(v), targetFiles = 4),
        s"compact where $colName = $v")
    case alterRe(name, ddl) =>
      // each column entry may carry `DEFAULT <literal>` (round-13, S63)
      // or `GENERATED ALWAYS AS (<expr>)` (S65): split either off before
      // the DDL parse. The entry split is literal- and paren-aware, so a
      // comma inside a quoted default or a generation expression never
      // splits.
      val entryRe =
        ("""(?is)^\s*(\S+\s+.+?)""" +
          """(?:\s+DEFAULT\s+('(?:[^']|'')*'""" +
          """|[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|NULL|TRUE|FALSE)""" +
          """|\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\))?\s*$""").r
      val parsed = splitTopLevel(ddl).map {
        case entryRe(colDdl, dflt, gen) =>
          // an unsupported DEFAULT form (function call, typed literal)
          // must fail HERE with its name, not deep inside the DDL parse
          require(!colDdl.matches("(?is).*\\bDEFAULT\\b.*"),
            s"TxSql ALTER: unsupported DEFAULT form in: $colDdl — " +
              "literals only (quoted string, number, NULL, TRUE, FALSE)")
          (colDdl, Option(dflt), Option(gen))
        case bad => sys.error(s"TxSql ALTER: cannot parse column: $bad")
      }
      val cleanDdl = parsed.map(_._1).mkString(", ")
      val defaults = parsed.collect { case (colDdl, Some(d), _) =>
        colDdl.trim.split("\\s+").head -> d
      }.toMap
      val generated = parsed.collect { case (colDdl, _, Some(g)) =>
        colDdl.trim.split("\\s+").head -> g
      }.toMap
      optSummary(spark, name,
        TxLog.alterAddColumns(spark, tableOf(name), cleanDdl, defaults,
          generated),
        s"alter add ($ddl)")
    case renameColRe(name, from, to) =>
      optSummary(spark, name,
        TxLog.alterRenameColumn(spark, tableOf(name), from, to),
        s"alter rename $from to $to")
    case dropColRe(name, colName) =>
      optSummary(spark, name,
        TxLog.alterDropColumn(spark, tableOf(name), colName),
        s"alter drop $colName")
    case widenColRe(name, colName, newType) =>
      // ALTER TABLE t ALTER COLUMN c TYPE <wider> — Delta 4.0 type
      // widening (S70): metadata-only, zero files rewritten
      optSummary(spark, name,
        TxLog.alterWidenColumn(spark, tableOf(name), colName, newType),
        s"alter widen $colName to $newType")
    case restoreRe(name, v) =>
      // RESTORE TABLE t TO VERSION AS OF v: one commit re-referencing the
      // historical version's immutable files (Delta RESTORE)
      optSummary(spark, name,
        TxLog.restore(spark, tableOf(name), v.toLong), s"restore to $v")
    case insertOverwriteRe(name, select) =>
      // INSERT OVERWRITE t SELECT …: dynamic partition overwrite on a
      // partitioned target (only the partitions the SELECT produces are
      // replaced — Spark's partitionOverwriteMode=dynamic semantics,
      // S58), full-table replace otherwise. Registered TxLog names in
      // the SELECT bind to their latest snapshots.
      val target = tableOf(name)
      val df = bindRegistered(spark, select)
      val v =
        if (TxLog.partitionColsOf(target).nonEmpty)
          TxLog.overwritePartitions(spark, target, df)
        else TxLog.overwriteAll(spark, target, df)
      optSummary(spark, name, v, "insert overwrite")
    case addConstraintRe(name, cname, check) =>
      // ALTER TABLE t ADD CONSTRAINT c CHECK (expr): metadata commit
      // after a one-pass proof the existing data satisfies it (S59)
      optSummary(spark, name,
        TxLog.alterAddConstraint(spark, tableOf(name), cname, check),
        s"add constraint $cname check ($check)")
    case dropConstraintRe(name, cname) =>
      optSummary(spark, name,
        TxLog.alterDropConstraint(tableOf(name), cname),
        s"drop constraint $cname")
    case cloneRe(name, srcName, loc) =>
      // CREATE TABLE c SHALLOW CLONE s [LOCATION '<dir>']: zero-copy fork
      // (S57). Without LOCATION the clone lands as a sibling directory of
      // the source — relative `../` references resolve either way.
      val src = tableOf(srcName)
      val tgt = Option(loc).map(new File(_)).getOrElse(
        new File(src.getParentFile, s"${src.getName}_clone_$name"))
      val v = TxLog.cloneShallow(spark, src, tgt)
      register(name, tgt)
      optSummary(spark, name, v, s"shallow clone of $srcName")
    case bloomCreateRe(name, colName, bits, k) =>
      // CREATE BLOOMFILTER INDEX ON t FOR COLUMNS (c [OPTIONS (bits=…,
      // k=…)]) — Delta's statement, S66: a metadata commit; every
      // subsequent write carries per-file bloom bitsets for the column
      optSummary(spark, name,
        TxLog.alterAddBloomIndex(spark, tableOf(name), colName,
          Option(bits).map(_.toInt).getOrElse(131072),
          Option(k).map(_.toInt).getOrElse(3)),
        s"create bloomfilter index ($colName)")
    case bloomDropRe(name, colName) =>
      optSummary(spark, name,
        TxLog.alterDropBloomIndex(tableOf(name), colName),
        s"drop bloomfilter index ($colName)")
    case createTableRe(name, ddl, parts, loc) =>
      // CREATE TABLE n (cols) USING graft [PARTITIONED BY (…)]
      // [LOCATION '…'] — an EMPTY declared table (S71); reads as an
      // empty frame until the first INSERT/COPY/append
      val dir = Option(loc).map(new File(_)).getOrElse(managedDir(name))
      dir.getParentFile.mkdirs()
      // column entries may carry `GENERATED ALWAYS AS IDENTITY` (S72):
      // strip it off before the DDL parse and declare the column's
      // allocation mark in the creating commit
      val idRe =
        """(?is)^(.*?)\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY\s*$""".r
      val (cleanEntries, idCols) = splitTopLevel(ddl)
        .foldLeft((Vector.empty[String], Vector.empty[String])) {
          case ((cs, ids), idRe(colDdl)) =>
            (cs :+ colDdl, ids :+ colDdl.trim.split("\\s+").head)
          case ((cs, ids), e) => (cs :+ e, ids)
        }
      val v = TxLog.createEmpty(dir, cleanEntries.mkString(", "),
        partColsOf(parts), idCols)
      register(name, dir)
      optSummary(spark, name, v, "create table")
    case ctasRe(name, parts, loc, select) =>
      // CREATE TABLE n USING graft [PARTITIONED BY (…)] [LOCATION '…']
      // AS SELECT … — declaration and first load in ONE commit;
      // registered TxLog names in the SELECT bind to latest snapshots
      val dir = Option(loc).map(new File(_)).getOrElse(managedDir(name))
      dir.getParentFile.mkdirs()
      val df = bindRegistered(spark, select)
      val v = TxLog.createAs(spark, dir, df, partColsOf(parts))
      register(name, dir)
      optSummary(spark, name, v, "create table as select")
    case insertIntoRe(name, query) =>
      // INSERT INTO t <SELECT…|VALUES…> — SQL-standard POSITIONAL
      // append (S71): arity must match the declared schema; columns
      // bind by position and cast to declared types, so a VALUES int
      // literal lands in a BIGINT column the way every engine does it
      val target = tableOf(name)
      val raw = bindRegistered(spark, query)
      val declared = TxLog.declaredSchema(spark, target)
      // IDENTITY columns are engine-assigned (S72): positional binding
      // covers the insertable (non-identity) columns only
      val idCols = TxLog.identitiesAsOf(target,
        TxLog.versions(target).last).keySet
      val insertable = declared.fields.filterNot(f => idCols(f.name))
      require(raw.columns.length == insertable.length,
        s"TxSql INSERT INTO: the query produces ${raw.columns.length} " +
          s"column(s) but $name declares ${insertable.length} " +
          "insertable " +
          insertable.map(_.name).mkString("(", ", ", ")"))
      val df = raw.toDF(insertable.map(_.name).toIndexedSeq: _*)
        .select(insertable.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      optSummary(spark, name, TxLog.append(df, target), "insert into")
    case copyIntoRe(name, path) =>
      // COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET — Delta's
      // idempotent bulk load (S67): file-level exactly-once; a re-run
      // commits nothing (committed_version = -1)
      optSummary(spark, name,
        TxLog.copyInto(spark, tableOf(name), new File(path)),
        "copy into")
    case vacuumRe(name, v) =>
      // VACUUM t RETAIN VERSION n: delete data files unreferenced by any
      // version >= n (the retention horizon); returns the deleted paths
      // so the caller sees exactly what a re-run would no-op on
      vacuumSummary(spark, name,
        TxLog.vacuum(tableOf(name), v.toLong))
    case _ =>
      // row-level DML (UPDATE / DELETE FROM / MERGE INTO) parses to
      // first-class Catalyst nodes — route to the TxDml execution layer
      // (round-13, S61); everything else is a SELECT with travel clauses
      val dml = scala.util.Try(
          spark.sessionState.sqlParser.parsePlan(text)).toOption
        .flatMap(TxDml.route(spark, _))
      dml match {
        case Some(v) =>
          import spark.implicits._
          Seq(("", "dml", v)).toDF("table", "operation", "committed_version")
        case None => selectAsOf(spark, text)
      }
  }

  private def vacuumSummary(spark: SparkSession, name: String,
      deleted: Seq[String]): DataFrame = {
    import spark.implicits._
    Seq((name, "vacuum", deleted.size.toLong))
      .toDF("table", "operation", "n_files_deleted")
  }

  private def optSummary(spark: SparkSession, name: String, v: Long,
      op: String): DataFrame = {
    import spark.implicits._
    Seq((name, op, v)).toDF("table", "operation", "committed_version")
  }

  private[sources] def tableOf(name: String): File =
    registered.getOrElse(name.toLowerCase,
      sys.error(s"TxSql: '$name' is not a registered TxLog table " +
        s"(known: ${registered.keys.toSeq.sorted.mkString(", ")})"))

  private[sources] def lookup(name: String): Option[File] =
    registered.get(name.toLowerCase)

  /** Run a plain SELECT with every REGISTERED TxLog name bound to its
    * latest snapshot (statements with travel clauses route through
    * [[selectAsOf]] instead). Binding is metadata-only; the query is an
    * ordinary pruned scan.
    *
    * Names bind as temp views under their BARE name for EXACTLY the
    * statement's analysis: identifier ROLES are the analyzer's business —
    * an r12 text-rewrite variant mangled same-named column aliases
    * (`SELECT count(*) AS orders` became `AS orders_bind_3`, r13
    * review). A pre-existing same-named temp view is SAVED (its raw
    * registry entry) and restored in a finally, so nothing outlives the
    * statement even on analysis failure and a later same-named session
    * view is never shadowed (the r12 advice, kept).
    */
  private[graft] def bindRegistered(spark: SparkSession, select: String)
      : DataFrame = {
    if (select.matches("(?is).*\\b(VERSION|TIMESTAMP)\\s+AS\\s+OF\\b.*") ||
        select.matches("(?is).*\\btable_changes\\s*\\(.*"))
      return selectAsOf(spark, select)
    val segments = splitOnLiterals(select)
    val cat = spark.sessionState.catalog
    val bound = scala.collection.mutable.ArrayBuffer.empty[(String,
      Option[org.apache.spark.sql.catalyst.catalog.TemporaryViewRelation])]
    try {
      registered.keys.toSeq.sorted.foreach { n =>
        val re = ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
        if (segments.exists(s => !s.startsWith("'") &&
            re.findFirstIn(s).isDefined)) {
          val prior = cat.getRawTempView(n)
          TxLog.snapshot(spark, registered(n)).createOrReplaceTempView(n)
          bound += ((n, prior))
        }
      }
      spark.sql(select) // eager analysis inlines the views
    } finally {
      bound.foreach {
        case (n, Some(prior)) => cat.createTempView(n, prior,
          overrideIfExists = true)
        case (n, None) => spark.catalog.dropTempView(n); ()
      }
    }
  }

  private def selectAsOf(spark: SparkSession, text: String): DataFrame =
    spark.sql(bindAsOfText(spark, text))

  /** The travel-binding half of [[selectAsOf]]: rewrite every
    * parser-confirmed travel span / table_changes call to a bound view
    * and return the rewritten TEXT (EXPLAIN wraps it; plain statements
    * execute it).
    */
  private def bindAsOfText(spark: SparkSession, text: String): String = {
    // pass 1 (round-12): table_changes('t', v1, v2) spans → views backed
    // by TxLog.changeFeed — the Delta table-valued function BI users
    // type; rewritten segment-aware BEFORE the parse (the TVF name would
    // not survive analysis)
    val (text2, nTvf) = rewriteTableChanges(spark, text)
    val plan = spark.sessionState.sqlParser.parsePlan(text2)
    // every travel spec in the statement, validated from the parse tree
    val travels = plan.collect {
      case RelationTimeTravel(UnresolvedRelation(parts, _, _), ts, v) =>
        (parts.mkString("."), ts, v)
    }.distinct
    require(travels.nonEmpty || nTvf > 0,
      "TxSql: statement has no VERSION AS OF / TIMESTAMP AS OF clause " +
        "and no table_changes() — use spark.sql")
    // bind each travel spec to a snapshot-backed temp view, then
    // substitute the parser-confirmed spans — OUTSIDE string literals
    // only (a blind text-wide replaceAll would also rewrite a quoted
    // literal that happens to contain the travel syntax, silently
    // corrupting output — r11 code-review finding). The statement is
    // split on single-quoted segments; substitution touches only the
    // code segments, so literals pass through byte-identical.
    val segments = splitOnLiterals(text2)
    travels.foreach {
      case (name, None, Some(version)) =>
        require(version.forall(_.isDigit),
          s"TxSql: VERSION AS OF must be an integer literal, got $version")
        val v = version.toLong
        val view = s"${name.replace('.', '_')}_asof_$v"
        TxLog.snapshot(spark, tableOf(name), Some(v))
          .createOrReplaceTempView(view)
        val re = "(?i)\\b" + java.util.regex.Pattern.quote(name) +
          "\\s+VERSION\\s+AS\\s+OF\\s+" + v + "\\b"
        for (i <- segments.indices if !segments(i).startsWith("'"))
          segments(i) = segments(i).replaceAll(re, view)
      case (name, Some(tsExpr), None) =>
        // TIMESTAMP AS OF (round-12, r11 verdict task 3): the literal
        // binds to the greatest stamped version <= t (TxLog.versionAt);
        // the travel span INCLUDES its quoted literal, so substitution
        // pairs a code segment ending `<name> TIMESTAMP AS OF` with the
        // literal segment that follows — never a text-wide rewrite
        val lit = tsExpr match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v,
              org.apache.spark.sql.types.StringType) => v.toString
          case other => sys.error("TxSql: TIMESTAMP AS OF must be a " +
            s"string literal ('yyyy-MM-dd[ HH:mm:ss]'), got $other")
        }
        val bound = TxLog.versionAt(tableOf(name), parseTsMillis(lit))
        val view = s"${name.replace('.', '_')}_tsasof_$bound"
        TxLog.snapshot(spark, tableOf(name), Some(bound))
          .createOrReplaceTempView(view)
        val tail = ("(?is)\\b" + java.util.regex.Pattern.quote(name) +
          "\\s+TIMESTAMP\\s+AS\\s+OF\\s*$").r
        var replaced = false
        for (i <- segments.indices.dropRight(1)
            if !segments(i).startsWith("'") &&
              segments(i + 1) == s"'$lit'") {
          tail.findFirstMatchIn(segments(i)).foreach { m =>
            segments(i) = segments(i).substring(0, m.start) + view
            segments(i + 1) = ""
            replaced = true
          }
        }
        require(replaced,
          s"TxSql: could not locate the TIMESTAMP AS OF span for $name")
      case (name, _, _) =>
        sys.error(s"TxSql: $name travel spec carries no usable version")
    }
    segments.mkString
  }

  /** SHOW PARTITIONS <name> (round-14, S75): the table's live partition
    * specs from LOG metadata alone — partition directory components of
    * the live add paths, rendered in Spark's `p=v[/q=w]` shape, distinct
    * and sorted. Zero data-file reads (the answer at 100 TB, where
    * listing the filesystem is the thing you must never do). Rejects on
    * a non-partitioned table, as Spark does.
    */
  private def showPartitions(spark: SparkSession, name: String,
      table: File): DataFrame = {
    import spark.implicits._
    val parts = TxLog.partitionColsOf(table)
    require(parts.nonEmpty,
      s"TxSql: SHOW PARTITIONS is not allowed on a table that is not " +
        s"partitioned: $name")
    val v = TxLog.versions(table).lastOption.getOrElse(
      sys.error(s"TxSql: SHOW PARTITIONS on empty table $name"))
    val specs = TxLog.liveState(table, v).live.map { a =>
      // partValsOf: the SAME `_p_<col>=<value>` parse the partition
      // prune keys on — one path-shape definition, no drift
      val m = TxLog.partValsOf(a.path)
      parts.map(c => s"$c=${Option(m.getOrElse(c, null))
        .getOrElse("__HIVE_DEFAULT_PARTITION__")}").mkString("/")
    }.distinct.sorted
    specs.toDF("partition")
  }

  /** SHOW CREATE TABLE <name> (round-14, S75 cont.): reconstruct the
    * statement that would re-declare this table — declared schema (with
    * IDENTITY markers inline), partitioning, location, and the active
    * constraint/default/bloom declarations as TBLPROPERTIES — entirely
    * from log metadata. Spark's one-row `createtab_stmt` shape.
    */
  private def showCreateTable(spark: SparkSession, name: String,
      table: File): DataFrame = {
    import spark.implicits._
    val v = TxLog.versions(table).lastOption.getOrElse(
      sys.error(s"TxSql: SHOW CREATE TABLE on empty table $name"))
    val schema = TxLog.schemaDdlAsOf(table, v)
      .map(org.apache.spark.sql.types.StructType.fromDDL)
      .getOrElse(TxLog.snapshot(spark, table, Some(v)).schema)
    val idents = TxLog.identitiesAsOf(table, v).keySet
    val cols = schema.fields.map { f =>
      val base = s"${f.name} ${f.dataType.sql}"
      if (idents(f.name)) s"$base GENERATED ALWAYS AS IDENTITY" else base
    }.mkString(",\n  ")
    val parts = TxLog.partitionColsOf(table)
    val partClause =
      if (parts.isEmpty) "" else s"\nPARTITIONED BY (${parts.mkString(", ")})"
    val props =
      TxLog.constraintsAsOf(table, v).toSeq.sortBy(_._1).map {
        case (n, e) => s"'constraint.$n' = '$e'" } ++
      TxLog.defaultsAsOf(table, v).toSeq.sortBy(_._1).map {
        case (c, (e, _)) => s"'default.$c' = '$e'" } ++
      TxLog.bloomsAsOf(table, v).toSeq.sortBy(_._1).map {
        case (c, (bits, k)) => s"'bloomindex.$c' = 'bits=$bits,k=$k'" }
    val propClause =
      if (props.isEmpty) ""
      else props.mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")")
    val stmt = s"CREATE TABLE $name (\n  $cols)\nUSING graft" +
      partClause +
      s"\nLOCATION '${table.getCanonicalPath}'" + propClause
    Seq(stmt).toDF("createtab_stmt")
  }

  /** SHOW TBLPROPERTIES <name> (round-14, S75): every declared table
    * property as (key, value) rows from log metadata — layout, active
    * constraints, column defaults, bloom index specs, identity
    * high-water marks, column-mapping entries, checkpoint state. The
    * BI-discovery twin of DESCRIBE DETAIL (which reports SIZE; this
    * reports DECLARATIONS). Sorted by key; zero data reads.
    */
  private def showTblProperties(spark: SparkSession, name: String,
      table: File): DataFrame = {
    import spark.implicits._
    val v = TxLog.versions(table).lastOption.getOrElse(
      sys.error(s"TxSql: SHOW TBLPROPERTIES on empty table $name"))
    val parts = TxLog.partitionColsOf(table)
    val props = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    props += ("graft.format" -> "graft-txlog")
    props += ("graft.location" -> table.getCanonicalPath)
    props += ("graft.latestVersion" -> v.toString)
    if (parts.nonEmpty)
      props += ("graft.partitionColumns" -> parts.mkString(","))
    TxLog.checkpoints(table).lastOption.foreach(c =>
      props += ("graft.checkpoint.lastVersion" -> c.toString))
    TxLog.constraintsAsOf(table, v).foreach { case (n, e) =>
      props += (s"constraint.$n" -> e) }
    TxLog.defaultsAsOf(table, v).foreach { case (c, (e, since)) =>
      props += (s"default.$c" -> s"$e (since v$since)") }
    TxLog.bloomsAsOf(table, v).foreach { case (c, (bits, k)) =>
      props += (s"bloomindex.$c" -> s"bits=$bits,k=$k") }
    TxLog.identitiesAsOf(table, v).foreach { case (c, hw) =>
      props += (s"identity.$c" -> s"highWater=$hw") }
    TxLog.mappingAsOf(table, v).foreach { case (logical, phys) =>
      props += (s"columnMapping.$logical" -> phys) }
    props.sortBy(_._1).toSeq.toDF("key", "value")
  }

  /** Deterministic UTC parse of a travel timestamp literal — the same
    * function stamps demo commits, so binding is timezone-independent.
    */
  private[graft] def parseTsMillis(s: String): Long = {
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    val t = s.trim
    val ldt =
      if (t.length <= 10) LocalDate.parse(t).atStartOfDay()
      else LocalDateTime.parse(t.replace(' ', 'T'))
    ldt.toInstant(ZoneOffset.UTC).toEpochMilli
  }

  /** Rewrite every `table_changes('name', from, to)` span (Delta's CDF
    * table-valued function, versions INCLUSIVE on both ends) to a temp
    * view backed by TxLog.changeFeed. Segment-aware: the span's table
    * name is itself a quoted literal, so the matcher pairs a code
    * segment ending `table_changes(` with the literal and the `, v1,
    * v2)` argument tail that follow — unrelated string literals pass
    * through untouched. Returns (rewritten text, spans rewritten).
    */
  private def rewriteTableChanges(spark: SparkSession,
      text: String): (String, Int) = {
    val segments = splitOnLiterals(text)
    var n = 0
    val head = """(?is)(.*)\btable_changes\s*\(\s*""".r
    val tailArgs = """(?s)^\s*,\s*(\d+)\s*,\s*(\d+)\s*\)(.*)""".r
    for (i <- segments.indices.dropRight(2)
        if !segments(i).startsWith("'") && segments(i + 1).startsWith("'")) {
      (segments(i), segments(i + 1), segments(i + 2)) match {
        case (head(pre), litSeg, tailArgs(d1, d2, rest)) =>
          val name = litSeg.substring(1, litSeg.length - 1)
          val from = d1.toLong; val to = d2.toLong
          require(to >= from,
            s"TxSql: table_changes range is empty: [$from, $to]")
          val t = tableOf(name)
          val latest = TxLog.versions(t).lastOption.getOrElse(
            sys.error(s"TxSql: table_changes on empty table $name"))
          require(to <= latest, s"TxSql: table_changes end version $to " +
            s"is beyond the latest commit ($latest)")
          val view = s"${name}_changes_${from}_$to"
          // Delta semantics: both ends inclusive; changeFeed's from is
          // exclusive, so start one below
          TxLog.changeFeed(spark, t, from - 1, to)
            .createOrReplaceTempView(view)
          segments(i) = pre + view
          segments(i + 1) = ""
          segments(i + 2) = rest
          n += 1
        case _ => ()
      }
    }
    (segments.mkString, n)
  }

  /** Split on TOP-LEVEL commas only — commas inside quoted literals or
    * parentheses stay put (the ADD COLUMNS entry splitter: a GENERATED
    * expression like `round(x, 2)` or a quoted default `'a, b'` must
    * never split).
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var depth = 0
    splitOnLiterals(s).foreach { seg =>
      if (seg.startsWith("'")) { out.last.append(seg); () }
      else seg.foreach {
        case '(' => depth += 1; out.last.append('(')
        case ')' => depth -= 1; out.last.append(')')
        case ',' if depth == 0 => out += new StringBuilder
        case c => out.last.append(c)
      }
    }
    out.toSeq.map(_.toString)
  }

  /** Split a statement into alternating code / 'quoted-literal' segments
    * (literals keep their quotes; '' escapes stay inside one literal).
    */
  private def splitOnLiterals(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inLit = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'') {
        if (!inLit) {
          out += cur.toString; cur.clear(); inLit = true; cur += c
        } else if (i + 1 < text.length && text.charAt(i + 1) == '\'') {
          cur += c; cur += c; i += 1 // escaped quote stays in-literal
        } else {
          cur += c; out += cur.toString; cur.clear(); inLit = false
        }
      } else cur += c
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  /** Delta's DESCRIBE DETAIL shape (round-13): one row of table-level
    * metadata — format, location, live file/row counts, on-disk bytes of
    * the live set, declared partition columns, active
    * constraint/default counts, and the latest version — ALL from log
    * metadata plus file-length stats (no data reads). The statement a
    * BI tool or operator issues to size a table before querying it.
    */
  private def describeDetail(spark: SparkSession, name: String,
      table: File): DataFrame = {
    import spark.implicits._
    val v = TxLog.versions(table).lastOption.getOrElse(
      sys.error(s"TxSql: DESCRIBE DETAIL on empty table $name"))
    val st = TxLog.liveState(table, v)
    val bytes = st.live.map(a =>
      new File(table, a.path).length()).sum
    val parts = TxLog.partitionColsOf(table)
    val nCons = TxLog.constraintsAsOf(table, v).size.toLong
    val nDflt = TxLog.defaultsAsOf(table, v).size.toLong
    Seq((name, "graft-txlog", table.getCanonicalPath,
      st.live.size.toLong, st.rowCount, bytes,
      if (parts.isEmpty) "" else parts.mkString(","),
      nCons, nDflt, v))
      .toDF("name", "format", "location", "num_files", "num_rows",
        "size_bytes", "partition_columns", "n_constraints", "n_defaults",
        "latest_version")
  }

  /** Delta's DESCRIBE HISTORY shape for any registered table: version,
    * op, rows after the commit, delta vs the previous version — from log
    * metadata alone (add actions carry row counts).
    */
  private def describeHistory(spark: SparkSession, table: File): DataFrame = {
    import spark.implicits._
    val vs = TxLog.versions(table)
    // logical counts: add bookkeeping minus live DV tombstones (r12)
    val counts = vs.map(v => TxLog.liveState(table, v).rowCount)
    vs.zipWithIndex.map { case (v, i) =>
      val prev = if (i == 0) 0L else counts(i - 1)
      (v, TxLog.readCommit(table, v).op, counts(i), counts(i) - prev)
    }.toDF("version", "op", "n_rows", "rows_delta")
      .orderBy(col("version"))
  }

  /** sql_time_travel (S49) — the statement surface end to end on the
    * demo table: one statement UNIONs censuses of TWO historical
    * versions (v1 = the first two appends, v3 = post-delete) through
    * `VERSION AS OF`, exercising multiple travel specs in one parse.
    * The oracle recomputes both version states from raw orders — the
    * hash-match proves statement-level travel reads exactly the
    * committed version sets.
    */
  def sqlTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val t = TxLog.demoTable(spark, dir)
    // register+bind under the demo lock: a concurrent call for a
    // DIFFERENT corpus re-registers the same name, and binding must see
    // this call's table (names are a per-statement namespace, not a
    // cross-corpus one)
    demoLock.synchronized {
    register("ord_log", t)
    sql(spark,
      """SELECT 'v1_two_appends' AS version, o_orderpriority,
        |  COUNT(*) AS n_orders, SUM(cents) AS total_cents
        |FROM ord_log VERSION AS OF 1
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'v3_post_delete', o_orderpriority,
        |  COUNT(*), SUM(cents)
        |FROM ord_log VERSION AS OF 3
        |GROUP BY o_orderpriority
        |ORDER BY version, o_orderpriority""".stripMargin)
    }
  }

  val sqlTimeTravelSql: String =
    """WITH t AS (
      |  SELECT year(o_orderdate) AS yr, o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |v1 AS (
      |  SELECT 'v1_two_appends' AS version, o_orderpriority,
      |    COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
      |  FROM t WHERE yr <= 1996 GROUP BY o_orderpriority),
      |v3 AS (
      |  SELECT 'v3_post_delete' AS version, o_orderpriority,
      |    COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS total_cents
      |  FROM t WHERE NOT (o_orderpriority = '3-MEDIUM' AND yr = 1997)
      |  GROUP BY o_orderpriority)
      |SELECT * FROM v1 UNION ALL SELECT * FROM v3
      |ORDER BY version, o_orderpriority""".stripMargin

  private val zorderDone =
    scala.collection.concurrent.TrieMap.empty[String, File]
  private[graft] val demoLock = new Object

  /** Z-order demo: orders census appended RANGE-BY-KEY (8 files — the
    * year is scattered across every file, worst case for a year
    * predicate), then `OPTIMIZE … ZORDER BY (yr, cents)` through the
    * statement surface. Built once per (JVM, corpus); the lock + the
    * per-step version guards make a crash-interrupted build resume by
    * running ONLY the missing step (the txnDemoDb discipline — a naive
    * re-run would double-append).
    */
  private[graft] def zorderDemo(spark: SparkSession, dir: String): File =
    demoLock.synchronized {
      zorderDone.getOrElseUpdate(dir, {
        val t = new File(sys.props("java.io.tmpdir"),
          s"graft_txzo_${ProcessHandle.current.pid}_${new File(dir).getName}")
        val have = TxLog.versions(t).size
        if (have < 1) {
          val o = graft.Tables.orders(spark, dir).select(
            col("o_orderkey"), col("o_orderpriority"),
            year(col("o_orderdate")).cast("long").as("yr"),
            graft.functions.Det.scaledLong(col("o_totalprice"), 100L)
              .as("cents"))
          TxLog.append(o.repartitionByRange(8, col("o_orderkey")), t)
        }
        register("zorders", t)
        if (TxLog.versions(t).size < 2)
          sql(spark, "OPTIMIZE zorders ZORDER BY (yr, cents)")
        t
      })
    }

  /** txlog_optimize_zorder (S49 cont.) — the maintenance statement end
    * to end: after `OPTIMIZE … ZORDER BY (yr, cents)` rewrites the
    * key-ranged layout, the per-year census must be IDENTICAL to the raw
    * recompute (the optimize is data-preserving) — and TxLogSpec pins
    * the actual payoff: a year predicate touches a strict subset of the
    * clustered files where it touched every key-ranged file before.
    */
  def txlogOptimizeZorder(spark: SparkSession, dir: String): DataFrame = {
    val t = zorderDemo(spark, dir)
    TxLog.snapshot(spark, t)
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
      .orderBy(col("yr"))
  }

  val txlogOptimizeZorderSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  private val evoDone =
    scala.collection.concurrent.TrieMap.empty[String, File]

  /** Schema-evolution demo on the LOG format: append the v1-schema slice,
    * `ALTER TABLE … ADD COLUMNS` through the statement surface (one
    * metadata-only commit), then append the evolved-schema slice. Built
    * once per (JVM, corpus).
    */
  private[graft] def evoDemo(spark: SparkSession, dir: String): File =
    demoLock.synchronized {
      evoDone.getOrElseUpdate(dir, {
        val t = new File(sys.props("java.io.tmpdir"),
          s"graft_txevo_${ProcessHandle.current.pid}_${new File(dir).getName}")
        val o = graft.Tables.orders(spark, dir).select(
          col("o_orderkey"), col("o_orderpriority"),
          year(col("o_orderdate")).cast("long").as("yr"),
          graft.functions.Det.scaledLong(col("o_totalprice"), 100L)
            .as("cents"))
        // per-step guards: a crash-interrupted build resumes by running
        // only the missing commits, never double-appending
        if (TxLog.versions(t).size < 1)
          TxLog.append(o.filter(col("yr") <= 1996).drop("yr"), t)  // v0
        register("evorders", t)
        if (TxLog.versions(t).size < 2)
          sql(spark, "ALTER TABLE evorders ADD COLUMNS (flag BIGINT)") // v1
        if (TxLog.versions(t).size < 3)
          TxLog.append(o.filter(col("yr") > 1996).drop("yr")
            .withColumn("flag", col("o_orderkey") % 7), t)           // v2
        t
      })
    }

  /** txlog_schema_evolution (S50) — ALTER ADD COLUMNS on the commit-log
    * format end to end: pre-alter files null-fill the evolved column,
    * post-alter files carry values, and the census splits the column's
    * aggregates by epoch so the hash-match proves the LOG's declared
    * schema (not the footers) owns the read. TxLogSpec additionally pins
    * that time travel to v0 serves the OLD schema.
    */
  def txlogSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val t = evoDemo(spark, dir)
    TxLog.snapshot(spark, t)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("flag")).as("n_with_flag"),
        sum(coalesce(col("flag"), lit(0L))).as("total_flag"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val txlogSchemaEvolutionSql: String =
    """WITH t AS (SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CASE WHEN year(o_orderdate) > 1996
      |      THEN o_orderkey % 7 END AS flag
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  COUNT(flag) AS n_with_flag,
      |  CAST(SUM(COALESCE(flag, 0)) AS BIGINT) AS total_flag,
      |  CAST(SUM(cents) AS BIGINT) AS total_cents
      |FROM t GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_time_travel" -> (sqlTimeTravel _),
    "txlog_optimize_zorder" -> (txlogOptimizeZorder _),
    "txlog_schema_evolution" -> (txlogSchemaEvolution _))

  def oracle: Map[String, String] = Map(
    "sql_time_travel" -> sqlTimeTravelSql,
    "txlog_optimize_zorder" -> txlogOptimizeZorderSql,
    "txlog_schema_evolution" -> txlogSchemaEvolutionSql)
}
