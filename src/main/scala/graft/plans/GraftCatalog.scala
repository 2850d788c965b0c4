package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ops.VersionedTable

/**
 * Named-table registry for the versioned lake — the thin mapping layer
 * that lets every SQL statement address a table as `metrics` instead of
 * `graft.`/lake/metrics``. The reference's warehouse is a NAMED-table
 * world (load_to_snowflake.py:70-84 `CREATE TABLE IF NOT EXISTS
 * DAILY_STOCK_METRICS`; every sample query in README.md:614-637 names
 * tables) — a user's first statement is `CREATE TABLE`, not a path
 * literal.
 *
 * Design: the catalog IS a directory of one-entry files (name → root
 * path + declared partition/key/schema metadata), resolved lazily at
 * statement parse/run time — deliberately NOT a Spark `CatalogPlugin`:
 *
 *  - every graft statement already flows through [[GraftSqlParser]], so
 *    name→path substitution there reaches the ENTIRE existing surface
 *    (SELECT / DML / MERGE / OPTIMIZE / VACUUM / branches / MVs) with
 *    zero per-statement integration — a `TableCatalog` would instead
 *    demand a parallel V2 Table/ScanBuilder stack beside the existing
 *    [[VersionedScan]] relation and still not cover OPTIMIZE/VACUUM.
 *  - one file per table keeps CREATE/DROP atomic (the same
 *    O_CREAT|O_EXCL claim the manifest protocol uses) and the catalog
 *    durable across sessions and engines with no service: on a shared
 *    filesystem every cluster sees the same names, like a Hive
 *    metastore's path mappings but with no metastore.
 *
 * The catalog stores only the MAPPING (plus declared partition cols,
 * merge keys, and schema for the first write to an empty table);
 * everything versioned — schema, stats, history, properties — lives in
 * the table's own manifest at its root. `DROP TABLE` therefore only
 * unregisters the name: data and history stay at the path
 * (external-table semantics), and `CREATE TABLE` over an existing root
 * re-attaches it.
 *
 * Location: `spark.graft.catalog.dir` when set, else
 * `<spark.sql.warehouse.dir>/_graft_catalog`. Names are SQL
 * identifiers, matched case-insensitively (stored lowercased in the
 * filename, original case in the entry).
 */
object GraftCatalog {

  /** A registered table: `partCols`/`keys`/`schemaDdl`/`statsCols`/
    * `bloomCols` are the DECLARED layout used by the first write to an
    * empty root (and to serve schema-only reads); once the root has
    * committed versions the manifest is authoritative. `derived` are
    * transform-partition declarations from `PARTITIONED BY (day(ts))` /
    * `(bucket(N, id))`: (partCol, kind, srcCol) with kind ∈ `day` |
    * `bucket:N` — the first write computes the column and registers the
    * derived partition in the manifest. */
  case class Entry(name: String, root: String, partCols: Seq[String],
                   keys: Seq[String], schemaDdl: Option[String],
                   statsCols: Seq[String] = Nil,
                   bloomCols: Seq[String] = Nil,
                   derived: Seq[(String, String, String)] = Nil,
                   kind: Option[String] = None)

  private val NameRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Synthetic partition column for tables created WITHOUT PARTITIONED
    * BY: a key-hash bucket (same device as MatView's serving table), so
    * the engine's partitioned-merge machinery applies unchanged and a
    * row's re-write always lands in its original partition. Hidden from
    * named reads/DESCRIBE; `__`-prefixed user columns are refused at
    * CREATE to keep the namespace internal. */
  private[graft] val BucketCol = "__bucket"
  private[graft] val BucketCount = 16

  /** Attach the deterministic bucket of `keys` (pure function — the
    * partCols-within-keys upsert contract holds by construction). */
  private[graft] def withBucket(df: org.apache.spark.sql.DataFrame,
                                keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    df.withColumn(BucketCol,
      pmod(xxhash64(keys.map(col): _*), lit(BucketCount)).cast("int"))
  }

  private[graft] def catalogDir(spark: SparkSession): Path = {
    val d = spark.conf.getOption("spark.graft.catalog.dir").getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
        "/_graft_catalog")
    new Path(d)
  }

  /** Default root for a CREATE TABLE with no LOCATION (managed layout):
    * a per-name directory beside the catalog. */
  private[graft] def managedRoot(spark: SparkSession, name: String): String =
    new Path(catalogDir(spark).getParent,
      s"graft_tables/${name.toLowerCase(java.util.Locale.ROOT)}")
      .toString

  private def entryPath(spark: SparkSession, name: String): Path =
    new Path(catalogDir(spark),
      "t." + name.toLowerCase(java.util.Locale.ROOT))

  private def b64e(s: String) = java.util.Base64.getEncoder
    .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def b64d(s: String) = new String(
    java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def render(e: Entry): String = {
    val sb = new StringBuilder("#graft-catalog\t1\n")
    sb.append("#name\t").append(b64e(e.name)).append('\n')
    sb.append("#root\t").append(b64e(e.root)).append('\n')
    if (e.partCols.nonEmpty)
      sb.append("#parts\t").append(e.partCols.map(b64e).mkString("\t"))
        .append('\n')
    if (e.keys.nonEmpty)
      sb.append("#keys\t").append(e.keys.map(b64e).mkString("\t"))
        .append('\n')
    e.schemaDdl.foreach(s =>
      sb.append("#schema\t").append(b64e(s)).append('\n'))
    if (e.statsCols.nonEmpty)
      sb.append("#stats\t").append(e.statsCols.map(b64e).mkString("\t"))
        .append('\n')
    if (e.bloomCols.nonEmpty)
      sb.append("#blooms\t").append(e.bloomCols.map(b64e).mkString("\t"))
        .append('\n')
    e.derived.foreach { case (p, kind, src) =>
      sb.append("#derived\t").append(b64e(p)).append('\t')
        .append(b64e(kind)).append('\t').append(b64e(src)).append('\n')
    }
    e.kind.foreach(k =>
      sb.append("#kind\t").append(b64e(k)).append('\n'))
    sb.toString
  }

  private def parse(text: String, at: Path): Entry = {
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith("#graft-catalog\t1")),
      s"unrecognized catalog entry at $at")
    def one(tag: String): Option[Seq[String]] = lines.collectFirst {
      case l if l.startsWith(s"#$tag\t") =>
        l.split("\t", -1).drop(1).toSeq.filter(_.nonEmpty).map(b64d)
    }
    Entry(
      name = one("name").get.head,
      root = one("root").get.head,
      partCols = one("parts").getOrElse(Nil),
      keys = one("keys").getOrElse(Nil),
      schemaDdl = one("schema").map(_.head),
      statsCols = one("stats").getOrElse(Nil),
      bloomCols = one("blooms").getOrElse(Nil),
      derived = lines.toSeq.collect {
        case l if l.startsWith("#derived\t") =>
          val p = l.split("\t", -1)
          (b64d(p(1)), b64d(p(2)), b64d(p(3)))
      },
      kind = one("kind").map(_.head))
  }

  /** Register `name` → entry. Atomic claim: two racing CREATEs see one
    * winner and one "already exists" — or, with `ifNotExists`, one
    * silent no-op (IF NOT EXISTS must hold exactly when the race it
    * exists for is lost, not only when the pre-check caught it). */
  def create(spark: SparkSession, entry: Entry,
             ifNotExists: Boolean = false): Unit = {
    require(NameRe.matches(entry.name),
      s"illegal graft table name: ${entry.name} (SQL identifier required)")
    val p = entryPath(spark, entry.name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try VersionedTable.createExclusive(fs, p)
      catch { case e: java.io.IOException =>
        if (ifNotExists) return
        throw new IllegalArgumentException(
          s"graft table ${entry.name} already exists " +
            "(DROP TABLE first, or CREATE TABLE IF NOT EXISTS)", e)
      }
    try out.write(render(entry).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Stage `bytes` under a temp name and RENAME over `p` — the shared
    * replace discipline for catalog entries (tables AND views). The
    * delete-then-rename still has a brief unregistered window for
    * readers, but a concurrent CREATE that steals the name in it loses
    * LOUDLY here (the rename fails) instead of silently co-existing —
    * and `.tmp.` stages are never listed as entries. */
  private def renameOver(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                         bytes: Array[Byte], what: String): Unit = {
    val tmp = new Path(p.getParent,
      p.getName + ".tmp." + java.util.UUID.randomUUID().toString)
    val out = VersionedTable.createExclusive(fs, tmp)
    try out.write(bytes)
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent CREATE $what raced this REPLACE — the replace " +
          "lost; re-run after inspecting it")
    }
  }

  /** REPLACE `name`'s entry in place (REPLACE TABLE's re-registration)
    * via [[renameOver]] — never a plain drop-then-create, so a steal
    * loses loudly instead of silently co-existing. */
  def replaceEntry(spark: SparkSession, entry: Entry): Unit = {
    require(NameRe.matches(entry.name),
      s"illegal graft table name: ${entry.name} (SQL identifier required)")
    val p = entryPath(spark, entry.name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    renameOver(fs, p, render(entry).getBytes(StandardCharsets.UTF_8),
      s"TABLE ${entry.name}")
  }

  /** Whether a temp view or session-catalog table of `name` exists —
    * the shadow every graft resolution honors (Spark's own resolution
    * order), shared by the batch parser and the streaming legs so the
    * two can never diverge. In-memory checks only. */
  def sessionShadowed(spark: SparkSession, name: String): Boolean =
    NameRe.matches(name) && {
      val cat = spark.sessionState.catalog
      cat.getTempView(name).isDefined ||
        cat.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(name))
    }

  /** Unregister `name`; the table's data and history stay at its root.
    * False when the name was not registered. */
  def drop(spark: SparkSession, name: String): Boolean = {
    val p = entryPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
  }

  /** Case-insensitive lookup. An entry vanishing between the existence
    * check and the read (concurrent DROP / [[replaceEntry]] window) is
    * "not registered at that instant" — None, not a crash. */
  def lookup(spark: SparkSession, name: String): Option[Entry] = {
    if (!NameRe.matches(name)) return None
    val p = entryPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in =
        try fs.open(p)
        catch { case _: java.io.FileNotFoundException => return None }
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      Some(parse(text, p))
    }
  }

  /** All registered tables, name-sorted. An entry that vanishes between
    * the listing and its read (a concurrent DROP, or [[replaceEntry]]'s
    * delete-then-rename window) is skipped, not a crash — and
    * replaceEntry's staged `.tmp.` files are never entries. */
  def list(spark: SparkSession): Seq[Entry] = {
    val d = catalogDir(spark)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("t.") &&
        !p.getName.contains(".tmp."))
      .flatMap(p => scala.util.Try(
        lookup(spark, p.getName.stripPrefix("t."))).toOption.flatten)
      .sortBy(_.name)
  }

  /** Resolve a statement-level table reference — `name` or
    * `name@branch` — to its root path (branch suffix carried through,
    * so every ref-scoped engine entry point works unchanged on named
    * branches). None when the name is not registered. */
  def resolve(spark: SparkSession, ref: String): Option[String] = {
    val at = ref.indexOf('@')
    val (name, branch) =
      if (at < 0) (ref, "") else (ref.substring(0, at), ref.substring(at))
    lookup(spark, name).map(_.root + branch)
  }

  /** Resolve a STREAMING leg's table reference: a string containing '/'
    * is a path (used verbatim, `@branch` suffixes included); anything
    * else must be a registered name or `name@branch` — unregistered or
    * SHADOWED names refuse loudly, the same rules batch SQL applies, so
    * a long-running stream never silently targets a table the user's
    * own SELECT would not show. */
  def resolveTableRef(spark: SparkSession, ref: String): String = {
    if (ref.contains('/')) return ref
    val at = ref.indexOf('@')
    val name = if (at < 0) ref else ref.substring(0, at)
    if (sessionShadowed(spark, name))
      throw new IllegalArgumentException(
        s"'$name' is a registered graft table but a temp view or " +
          "session-catalog table of the same name shadows it — " +
          "address it by path")
    resolve(spark, ref).getOrElse(throw new IllegalArgumentException(
      s"'$name' is not a registered graft table — CREATE TABLE $name " +
        "USING graft first, or pass a path"))
  }

  // ----- named logical views ----------------------------------------
  // A view is a SAVED QUERY, not a table: one `v.<name>` file holding
  // the SQL text, substituted into the reading statement's plan at
  // resolve time (late binding — the view always serves the CURRENT
  // contents of the tables it reads). Same durable one-file-per-entry
  // store as tables, same atomic-claim CREATE; tables and views share
  // the name namespace (a reference must resolve to exactly one thing),
  // enforced by the CREATE commands.

  private def viewPath(spark: SparkSession, name: String): Path =
    new Path(catalogDir(spark),
      "v." + name.toLowerCase(java.util.Locale.ROOT))

  private def renderView(name: String, sql: String): String =
    s"#graft-view\t1\n#name\t${b64e(name)}\n#sql\t${b64e(sql)}\n"

  /** Register a view. Plain CREATE is the same atomic claim tables use;
    * OR REPLACE rides [[renameOver]], the shared replace discipline. */
  def createView(spark: SparkSession, name: String, sql: String,
                 orReplace: Boolean = false): Unit = {
    require(NameRe.matches(name),
      s"illegal graft view name: $name (SQL identifier required)")
    val p = viewPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (orReplace)
      renameOver(fs, p,
        renderView(name, sql).getBytes(StandardCharsets.UTF_8),
        s"VIEW $name")
    else {
      val out =
        try VersionedTable.createExclusive(fs, p)
        catch { case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"graft view $name already exists (CREATE OR REPLACE VIEW " +
              "to redefine, or DROP VIEW first)", e)
        }
      try out.write(renderView(name, sql).getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** The view's SQL text; None when no view of that name is registered.
    * Same vanish-tolerant read as [[lookup]]. */
  def lookupView(spark: SparkSession, name: String): Option[String] = {
    if (!NameRe.matches(name)) return None
    val p = viewPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in =
      try fs.open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith("#graft-view\t1")),
      s"unrecognized view entry at $p")
    lines.collectFirst { case l if l.startsWith("#sql\t") =>
      b64d(l.split("\t", -1)(1)) }
  }

  /** Unregister a view; false when it was not registered. */
  def dropView(spark: SparkSession, name: String): Boolean = {
    val p = viewPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
  }

  /** All registered views, name-sorted: (name, sql). */
  def listViews(spark: SparkSession): Seq[(String, String)] = {
    val d = catalogDir(spark)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v.") && !n.contains(".tmp."))
      .flatMap { n =>
        val nm = n.stripPrefix("v.")
        scala.util.Try(lookupView(spark, nm)).toOption.flatten
          .map(nm -> _)
      }.sortBy(_._1)
  }
}
