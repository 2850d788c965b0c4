package graft

import org.apache.spark.sql.functions._

import graft.ops.VersionedTable
import graft.plans.GraftCatalog

/** Named-table catalog (GraftCatalog + parser name resolution): the full
  * SQL lifecycle with zero path literals after CREATE, re-attach over
  * existing roots, Spark-compatible shadowing order, and named branches /
  * materialized views / column DDL. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cat_$tag").toString

  test("full named lifecycle: CREATE, INSERT, MERGE, SELECT, DML, " +
      "maintenance, DROP — zero path literals after CREATE") {
    val path = tmp("life") + "/events"
    spark.sql(
      s"""CREATE TABLE cat_events (id INT, grp STRING, v INT, w BIGINT)
         |USING graft LOCATION '$path' PARTITIONED BY (grp)
         |TBLPROPERTIES('graft.keys'='id,grp')""".stripMargin)
    // a declared-but-empty table serves a zero-row relation of its schema
    val empty = spark.sql("SELECT * FROM cat_events")
    assert(empty.columns.toSeq == Seq("id", "grp", "v", "w"))
    assert(empty.count() == 0)
    // INSERT VALUES (positional), then a reordered explicit column list
    spark.sql(
      "INSERT INTO cat_events VALUES (1,'g0',5,10), (2,'g1',6,20)")
    spark.sql(
      "INSERT INTO cat_events (w, id, grp, v) SELECT 30L, 3, 'g0', 7")
    assert(spark.sql("SELECT count(*) AS n FROM cat_events")
      .first.getLong(0) == 3)
    // keyed warehouse semantics: same key replaces, never duplicates
    spark.sql("INSERT INTO cat_events VALUES (1,'g0',50,100)")
    val afterUpsert = spark.sql(
      "SELECT v FROM cat_events WHERE id = 1").collect()
    assert(afterUpsert.map(_.getInt(0)).toSeq == Seq(50))
    assert(spark.sql("SELECT count(*) AS n FROM cat_events")
      .first.getLong(0) == 3)
    // MERGE by bare name, named temp-view source
    Seq((2, "g1", 60, 200L), (4, "g2", 8, 40L))
      .toDF("id", "grp", "v", "w").createOrReplaceTempView("cat_src")
    spark.sql(
      """MERGE INTO cat_events t USING cat_src s
        |ON t.id = s.id AND t.grp = s.grp
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT sum(v) AS s FROM cat_events")
      .first.getLong(0) == (50 + 60 + 7 + 8))
    // UPDATE / DELETE by name
    spark.sql("UPDATE cat_events SET w = w + 1 WHERE grp = 'g2'")
    spark.sql("DELETE FROM cat_events WHERE id = 3")
    assert(spark.sql("SELECT w FROM cat_events WHERE id = 4")
      .first.getLong(0) == 41L)
    // the table functions take the registered NAME too
    assert(spark.sql("SELECT count(*) AS n FROM graft_table('cat_events')")
      .first.getLong(0) ==
      spark.sql("SELECT count(*) AS n FROM cat_events").first.getLong(0))
    assert(spark.sql("SELECT count(*) AS n " +
      "FROM graft_partitions('cat_events')").first.getLong(0) > 0)
    intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM graft_table('cat_never_registered')"))
    // name works inside joins/subqueries/CTEs too
    val joined = spark.sql(
      """WITH big AS (SELECT id FROM cat_events WHERE v >= 50)
        |SELECT count(*) AS n FROM cat_events e
        |JOIN big ON e.id = big.id""".stripMargin)
    assert(joined.first.getLong(0) == 2)
    // maintenance + history by name
    assert(spark.sql("OPTIMIZE cat_events").first.getInt(0) > 0)
    spark.sql("ALTER TABLE cat_events SET TBLPROPERTIES" +
      "('graft.retain.versions'='2')")
    assert(spark.sql("SHOW TBLPROPERTIES cat_events").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
      .get("graft.retain.versions").contains("2"))
    assert(spark.sql("DESCRIBE HISTORY cat_events").count() >= 5)
    assert(spark.sql("DESCRIBE DETAIL cat_events")
      .first.getAs[String]("merge_keys") == "id, grp")
    spark.sql("VACUUM cat_events")
    // DESCRIBE t: schema + partition section
    val desc = spark.sql("DESCRIBE cat_events").collect()
      .map(_.getString(0)).toSeq
    assert(desc.take(4) == Seq("id", "grp", "v", "w"))
    assert(desc.contains("# Partition Information") && desc.last == "grp")
    // SHOW GRAFT TABLES lists it with its root
    val listed = spark.sql("SHOW GRAFT TABLES").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(listed.exists { case (n, r) => n == "cat_events" && r == path })
    // time travel by name through graft_table? names resolve in FROM,
    // versions via the TVF on the recorded root — the catalog's job is
    // the mapping, snapshots stay on the TVF
    // DROP unregisters the NAME; data and history survive at the path
    spark.sql("DROP TABLE cat_events")
    intercept[Exception](spark.sql("SELECT * FROM cat_events").collect())
    assert(VersionedTable.read(spark, path).count() == 3)
    // re-CREATE over the existing root re-attaches (manifest wins; no
    // schema needed); a mismatching declared layout refuses
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE TABLE cat_events USING graft LOCATION '$path' " +
        "PARTITIONED BY (v)")
    }
    spark.sql(s"CREATE TABLE cat_events USING graft LOCATION '$path'")
    assert(spark.sql("SELECT count(*) AS n FROM cat_events")
      .first.getLong(0) == 3)
    spark.sql("DROP TABLE cat_events")
  }

  test("CREATE TABLE: IF NOT EXISTS no-op, duplicate refuses, managed " +
      "location, declared-layout validation") {
    spark.sql("CREATE TABLE cat_managed (id INT, v INT) USING graft " +
      "TBLPROPERTIES('graft.keys'='id')")
    val entry = GraftCatalog.lookup(spark, "cat_managed").get
    assert(entry.root.contains("graft_tables/cat_managed"))
    spark.sql("INSERT INTO cat_managed VALUES (1, 2)")
    assert(spark.sql("SELECT v FROM cat_managed").first.getInt(0) == 2)
    intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE cat_managed (id INT) USING graft")
    }
    spark.sql("CREATE TABLE IF NOT EXISTS cat_managed (id INT) USING graft")
    // declared key/partition columns must exist in the declared schema
    intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE cat_badcols (id INT) USING graft " +
        "PARTITIONED BY (nope)")
    }
    // non-graft properties refuse loudly at CREATE
    val e = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE cat_badprop (id INT) USING graft " +
        "TBLPROPERTIES('retention'='7')")
    }
    assert(e.getMessage.contains("graft.keys"))
    spark.sql("DROP TABLE cat_managed")
    // DROP of an unregistered name falls through to Spark
    spark.sql("DROP TABLE IF EXISTS cat_managed") // no-op, no error
    intercept[Exception](spark.sql("DROP TABLE cat_never_existed"))
  }

  test("shadowing: CTE, temp view, and Spark tables win over graft names") {
    val path = tmp("shadow") + "/t"
    spark.sql(s"CREATE TABLE cat_shadow (id INT, g STRING) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_shadow VALUES (1, 'real')")
    // CTE of the same name shadows the catalog table
    assert(spark.sql(
      "WITH cat_shadow AS (SELECT 'cte' AS g) SELECT g FROM cat_shadow")
      .first.getString(0) == "cte")
    // temp view shadows it
    Seq("view").toDF("g").createOrReplaceTempView("cat_shadow")
    assert(spark.sql("SELECT g FROM cat_shadow").first.getString(0)
      == "view")
    spark.catalog.dropTempView("cat_shadow")
    assert(spark.sql("SELECT g FROM cat_shadow").first.getString(0)
      == "real")
    spark.sql("DROP TABLE cat_shadow")
  }

  test("named branches: create, write via the @branch ref, fast forward") {
    val path = tmp("branch") + "/t"
    spark.sql(s"CREATE TABLE cat_br (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_br VALUES (1,'g0',10), (2,'g1',20)")
    spark.sql("ALTER TABLE cat_br CREATE BRANCH dev")
    spark.sql("INSERT INTO `cat_br@dev` VALUES (3,'g0',30)")
    // main unchanged; branch sees the write; SELECT works on both refs
    assert(spark.sql("SELECT count(*) AS n FROM cat_br")
      .first.getLong(0) == 2)
    assert(spark.sql("SELECT count(*) AS n FROM `cat_br@dev`")
      .first.getLong(0) == 3)
    assert(spark.sql("SHOW BRANCHES IN cat_br").collect()
      .map(_.getString(0)).toSeq == Seq("dev"))
    spark.sql("ALTER TABLE cat_br FAST FORWARD BRANCH dev")
    assert(spark.sql("SELECT count(*) AS n FROM cat_br")
      .first.getLong(0) == 3)
    spark.sql("ALTER TABLE cat_br DROP BRANCH dev")
    spark.sql("DROP TABLE cat_br")
  }

  test("named materialized view over a named source table") {
    val path = tmp("mv") + "/src"
    spark.sql(s"CREATE TABLE cat_mv_src (id INT, g STRING, x BIGINT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_mv_src VALUES " +
      "(1,'a',10), (2,'a',20), (3,'b',5)")
    // CREATE MV by a NEW name: auto-registers against a managed root
    spark.sql(
      """CREATE MATERIALIZED VIEW cat_mv_agg KEYED BY (id, g) AS
        |SELECT g, sum(x) AS x_sum, avg(x) AS x_avg,
        |  approx_count_distinct(x) AS x_dct, count(*) AS n
        |FROM cat_mv_src GROUP BY g""".stripMargin)
    // the NAME serves the VIEW shape (measures, no internals)
    val served = spark.sql(
      "SELECT g, x_sum, x_avg, x_dct, n FROM cat_mv_agg ORDER BY g")
      .collect()
    assert(served.map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getLong(4)))
      .toSeq == Seq(("a", 30L, 15.0, 2L, 2L), ("b", 5L, 5.0, 1L, 1L)))
    // incremental refresh by name after a source change
    spark.sql("INSERT INTO cat_mv_src VALUES (4,'b',7)")
    spark.sql("REFRESH MATERIALIZED VIEW cat_mv_agg")
    assert(spark.sql("SELECT x_sum FROM cat_mv_agg WHERE g = 'b'")
      .first.getLong(0) == 12L)
    spark.sql("DROP TABLE cat_mv_agg")
    spark.sql("DROP TABLE cat_mv_src")
  }

  test("column DDL by name: ADD, RENAME (data + pruning survive), DROP") {
    val path = tmp("ddl") + "/t"
    spark.sql(s"CREATE TABLE cat_ddl (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_ddl VALUES (1,'g0',5), (2,'g1',6)")
    spark.sql("ALTER TABLE cat_ddl ADD COLUMN w BIGINT")
    assert(spark.sql("SELECT w FROM cat_ddl WHERE id = 1").first.isNullAt(0))
    spark.sql("ALTER TABLE cat_ddl RENAME COLUMN v TO score")
    // old-generation data surfaces under the new name, by name in SQL
    assert(spark.sql("SELECT sum(score) AS s FROM cat_ddl")
      .first.getLong(0) == 11L)
    spark.sql("INSERT INTO cat_ddl VALUES (3,'g0',50,9)")
    assert(spark.sql("SELECT sum(score) AS s FROM cat_ddl")
      .first.getLong(0) == 61L)
    spark.sql("ALTER TABLE cat_ddl DROP COLUMN w")
    assert(!spark.sql("SELECT * FROM cat_ddl").columns.contains("w"))
    // unsupported shapes refuse loudly instead of guessing
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE cat_ddl ADD COLUMN q INT NOT NULL")
    }
    // the reserved __ namespace holds in BOTH DDL directions — a
    // __-prefixed column would vanish from named reads/DESCRIBE
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE cat_ddl ADD COLUMN __q INT")
    }
    intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE cat_ddl RENAME COLUMN score TO __score")
    }
    spark.sql("DROP TABLE cat_ddl")
  }

  test("shadowed names: DML/DDL agree with the read path — writes never " +
      "silently target a graft table SELECT does not show") {
    val path = tmp("shdml") + "/t"
    spark.sql(s"CREATE TABLE cat_shdml (id INT, v INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_shdml VALUES (1, 10)")
    Seq((1, 99)).toDF("id", "v").createOrReplaceTempView("cat_shdml")
    try {
      // reads serve the temp view (Spark's order) ...
      assert(spark.sql("SELECT v FROM cat_shdml").first.getInt(0) == 99)
      // ... so DML must NOT claim the graft table: it falls through to
      // Spark, which refuses DML on a temp view — and the graft data
      // is untouched either way
      intercept[Exception](
        spark.sql("UPDATE cat_shdml SET v = 0 WHERE id = 1"))
      intercept[Exception](
        spark.sql("DELETE FROM cat_shdml WHERE id = 1"))
      assert(spark.sql(s"SELECT v FROM graft_table('$path')")
        .first.getInt(0) == 10)
      // graft-only statements cannot fall through: loud shadow error
      val e = intercept[IllegalArgumentException](
        spark.sql("OPTIMIZE cat_shdml"))
      assert(e.getMessage.contains("shadow"))
    } finally spark.catalog.dropTempView("cat_shdml")
    // with the shadow gone, DML addresses the graft table again
    spark.sql("UPDATE cat_shdml SET v = 11 WHERE id = 1")
    assert(spark.sql("SELECT v FROM cat_shdml").first.getInt(0) == 11)
    spark.sql("DROP TABLE cat_shdml")
  }

  test("CTE scoping: sibling CTEs visible inside definitions; an inner " +
      "subquery's CTE never shadows an outer graft reference") {
    val path = tmp("cte") + "/t"
    spark.sql(s"CREATE TABLE cat_cte (id INT, v INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_cte VALUES (1, 10), (2, 20)")
    // a CTE body referencing a PRIOR sibling of the same name as the
    // graft table must resolve the sibling, not the table
    assert(spark.sql(
      """WITH cat_cte AS (SELECT 99 AS id),
        |b AS (SELECT * FROM cat_cte)
        |SELECT id FROM b""".stripMargin).first.getInt(0) == 99)
    // a CTE defined INSIDE a subquery is invisible outside it: the
    // outer reference is the graft table (plan-global name collection
    // would leave it unresolved)
    assert(spark.sql(
      """SELECT count(*) AS n FROM cat_cte WHERE id IN
        |(WITH cat_cte AS (SELECT 1 AS id) SELECT id FROM cat_cte)"""
        .stripMargin).first.getLong(0) == 1)
    spark.sql("DROP TABLE cat_cte")
  }

  test("MERGE clause matrix: partial-column source, case-insensitive SET " +
      "targets, bucketed tables, conditional INSERT into new partitions") {
    val path = tmp("mcm") + "/t"
    spark.sql(s"CREATE TABLE cat_mcm (id INT, g STRING, v INT, w INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql(
      "INSERT INTO cat_mcm VALUES (1,'a',10,1), (2,'a',20,2), (3,'b',30,3)")
    // non-star MERGE from a source LACKING table column w: only the
    // touched columns need to exist (SET */INSERT * coverage is not
    // required here), and the SET target resolves case-insensitively
    Seq((1, "a", 100), (3, "b", 300)).toDF("id", "g", "v")
      .createOrReplaceTempView("cat_mcm_s")
    spark.sql(
      """MERGE INTO cat_mcm t USING cat_mcm_s s
        |ON t.id = s.id AND t.g = s.g
        |WHEN MATCHED AND s.v >= 300 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET V = s.v""".stripMargin)
    val rows = spark.sql("SELECT id, v, w FROM cat_mcm ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, 100, 1), (2, 20, 2))) // 3 deleted, w kept
    // conditional INSERT whose rows all land in a BRAND-NEW partition
    // (no live partition matches): the insert condition references the
    // source and must filter, not crash
    Seq((7, "z", 5, 70), (8, "z", -1, 80)).toDF("id", "g", "v", "w")
      .createOrReplaceTempView("cat_mcm_new")
    spark.sql(
      """MERGE INTO cat_mcm t USING cat_mcm_new s
        |ON t.id = s.id AND t.g = s.g
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id FROM cat_mcm WHERE g = 'z'")
      .collect().map(_.getInt(0)).toSeq == Seq(7))
    spark.sql("DROP TABLE cat_mcm")
    // the clause matrix on a table created WITHOUT PARTITIONED BY (the
    // synthetic __bucket partition is recomputed, never user-supplied)
    spark.sql("CREATE TABLE cat_mcm_b (id INT, v INT) USING graft " +
      "TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_mcm_b VALUES (1,10), (2,20), (3,30)")
    Seq((2, 0), (4, 40)).toDF("id", "v")
      .createOrReplaceTempView("cat_mcm_bs")
    spark.sql(
      """MERGE INTO cat_mcm_b t USING cat_mcm_bs s ON t.id = s.id
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id FROM cat_mcm_b ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 3, 4))
    spark.sql("DROP TABLE cat_mcm_b")
  }

  test("CTAS: registration + first write in one statement; IF NOT " +
      "EXISTS on an existing name never executes the query") {
    val path = tmp("ctas") + "/t"
    Seq((1, "a", 10), (2, "b", 20), (1, "a", 99))
      .toDF("id", "g", "v").createOrReplaceTempView("cat_ctas_src")
    spark.sql(
      s"""CREATE TABLE cat_ctas USING graft LOCATION '$path'
         |PARTITIONED BY (g) TBLPROPERTIES('graft.keys'='id,g')
         |AS SELECT * FROM cat_ctas_src WHERE v < 99""".stripMargin)
    assert(spark.sql("SELECT sum(v) AS s FROM cat_ctas")
      .first.getLong(0) == 30L)
    // keyed semantics identical to CREATE-then-INSERT
    spark.sql("INSERT INTO cat_ctas VALUES (1, 'a', 50)")
    assert(spark.sql("SELECT v FROM cat_ctas WHERE id = 1")
      .first.getInt(0) == 50)
    // IF NOT EXISTS on an existing name: full no-op, query NOT run
    spark.sql(
      """CREATE TABLE IF NOT EXISTS cat_ctas USING graft
        |TBLPROPERTIES('graft.keys'='id')
        |AS SELECT 7 AS id, 'z' AS g, 0 AS v""".stripMargin)
    assert(spark.sql("SELECT count(*) AS n FROM cat_ctas")
      .first.getLong(0) == 2)
    // CTAS needs keys; CTAS over a written root refuses (CREATE
    // re-attaches, CTAS defines content)
    intercept[IllegalArgumentException](spark.sql(
      "CREATE TABLE cat_ctas_nokeys USING graft AS SELECT 1 AS id"))
    intercept[IllegalArgumentException](spark.sql(
      s"""CREATE TABLE cat_ctas2 USING graft LOCATION '$path'
         |TBLPROPERTIES('graft.keys'='id')
         |AS SELECT 1 AS id""".stripMargin))
    spark.sql("DROP TABLE cat_ctas")
  }

  test("named time travel: VERSION AS OF / TIMESTAMP AS OF on a " +
      "registered name") {
    val path = tmp("tt") + "/t"
    spark.sql(s"CREATE TABLE cat_tt (id INT, v INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_tt VALUES (1, 10), (2, 20)") // v0
    spark.sql("UPDATE cat_tt SET v = v + 100")              // v1
    assert(spark.sql("SELECT sum(v) AS s FROM cat_tt")
      .first.getLong(0) == 230L)
    assert(spark.sql("SELECT sum(v) AS s FROM cat_tt VERSION AS OF 0")
      .first.getLong(0) == 30L)
    // a far-future timestamp resolves to the current version
    assert(spark.sql(
      "SELECT sum(v) AS s FROM cat_tt TIMESTAMP AS OF '2099-01-01'")
      .first.getLong(0) == 230L)
    // a CTE of the same name still shadows the time-travel reference
    assert(spark.sql(
      """WITH cat_tt AS (SELECT 1 AS v) SELECT sum(v) AS s
        |FROM cat_tt""".stripMargin).first.getLong(0) == 1L)
    intercept[Exception](spark.sql(
      "SELECT * FROM cat_tt TIMESTAMP AS OF '1999-01-01'").collect())
    spark.sql("DROP TABLE cat_tt")
  }

  test("SHOW CREATE TABLE round-trips: emitted DDL re-attaches after " +
      "DROP, declarations preserved") {
    val path = tmp("sct") + "/t"
    spark.sql(s"CREATE TABLE cat_sct (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g', 'graft.stats'='id')")
    spark.sql("INSERT INTO cat_sct VALUES (1,'a',10)")
    val ddl = spark.sql("SHOW CREATE TABLE cat_sct").first.getString(0)
    assert(ddl.contains("USING graft") && ddl.contains(s"LOCATION '$path'"))
    assert(ddl.contains("PARTITIONED BY (g)"))
    assert(ddl.contains("'graft.keys'='id,g'"))
    assert(!ddl.contains("__")) // internal columns never leak
    spark.sql("DROP TABLE cat_sct")
    spark.sql(ddl) // re-attach from the emitted statement
    assert(spark.sql("SELECT v FROM cat_sct WHERE id = 1")
      .first.getInt(0) == 10)
    spark.sql("DROP TABLE cat_sct")
  }

  test("ALTER COLUMN TYPE widening: metadata-only, old files promote at " +
      "scan, stats survive, narrowing refuses") {
    val path = tmp("widen") + "/t"
    spark.sql(s"CREATE TABLE cat_widen (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g', 'graft.stats'='v')")
    spark.sql("INSERT INTO cat_widen VALUES (1,'a',5), (2,'a',7), (3,'b',9)")
    val filesBefore = new java.io.File(path).listFiles().length
    spark.sql("ALTER TABLE cat_widen ALTER COLUMN v TYPE BIGINT")
    // metadata-only: same data files, old int32 files promote at scan
    assert(spark.sql("SELECT v FROM cat_widen WHERE id = 1")
      .first.getLong(0) == 5L)
    // values beyond int range now land
    spark.sql(s"INSERT INTO cat_widen VALUES (4,'b',${Long.MaxValue}L)")
    assert(spark.sql("SELECT max(v) AS m FROM cat_widen")
      .first.getLong(0) == Long.MaxValue)
    // stats re-tagged under the wider type: pruning still engages on v
    val root = graft.plans.GraftCatalog.lookup(spark, "cat_widen").get.root
    val (kept, total) = VersionedTable.skipStats(spark, root, "v", 6L, 8L)
    assert(total >= 2 && kept < total,
      s"widened stats stopped pruning: $kept/$total")
    // time travel reads the pre-widening schema it recorded
    assert(spark.sql("SELECT v FROM cat_widen VERSION AS OF 0 " +
      "WHERE id = 1").first.getInt(0) == 5)
    // narrowing and partition columns refuse
    intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE cat_widen ALTER COLUMN v TYPE INT"))
    intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE cat_widen ALTER COLUMN g TYPE BINARY"))
    spark.sql("DROP TABLE cat_widen")
    assert(filesBefore > 0)
  }

  test("TRUNCATE TABLE and INSERT OVERWRITE: one-commit replacement, " +
      "declarations carry, time travel intact") {
    val path = tmp("trunc") + "/t"
    spark.sql(s"CREATE TABLE cat_tr (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_tr VALUES (1,'a',10), (2,'b',20)") // v0
    // OVERWRITE replaces everything in ONE commit (v1)
    spark.sql("INSERT OVERWRITE cat_tr VALUES (7,'c',70), (8,'c',80)")
    assert(spark.sql("SELECT id FROM cat_tr ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(7, 8))
    assert(spark.sql("SELECT count(*) AS n FROM cat_tr VERSION AS OF 0")
      .first.getLong(0) == 2) // pre-overwrite content intact
    // keyed semantics resume on the replaced content
    spark.sql("INSERT INTO cat_tr VALUES (7,'c',700)")
    assert(spark.sql("SELECT v FROM cat_tr WHERE id = 7")
      .first.getInt(0) == 700)
    // TRUNCATE: metadata-only, zero rows, schema + keys survive
    spark.sql("TRUNCATE TABLE cat_tr")
    assert(spark.sql("SELECT count(*) AS n FROM cat_tr")
      .first.getLong(0) == 0)
    assert(spark.sql("SELECT * FROM cat_tr").columns.toSeq ==
      Seq("id", "g", "v"))
    spark.sql("INSERT INTO cat_tr VALUES (1,'a',1)") // table still works
    assert(spark.sql("SELECT count(*) AS n FROM cat_tr")
      .first.getLong(0) == 1)
    intercept[IllegalArgumentException](
      spark.sql("TRUNCATE TABLE cat_tr PARTITION (g='a')"))
    // truncating the ALREADY-empty table is a provable no-op (no commit)
    val histBefore = spark.sql("DESCRIBE HISTORY cat_tr").count()
    spark.sql("TRUNCATE TABLE cat_tr")
    spark.sql("TRUNCATE TABLE cat_tr")
    assert(spark.sql("DESCRIBE HISTORY cat_tr").count() == histBefore + 1)
    // OVERWRITE must cover every table column — a projection mistake
    // would otherwise silently narrow the schema
    val e = intercept[Exception](spark.sql(
      "INSERT OVERWRITE cat_tr SELECT 1 AS id, 'a' AS g"))
    assert(e.getMessage.contains("all 3 table columns"))
    // the engine-level guard catches the Scala path too
    val root2 = graft.plans.GraftCatalog.lookup(spark, "cat_tr").get.root
    val e2 = intercept[IllegalArgumentException](
      VersionedTable.overwrite(spark, root2,
        Seq((1, "a")).toDF("id", "g"), Seq("id", "g"), Seq("g")))
    assert(e2.getMessage.contains("cover"))
    spark.sql("DROP TABLE cat_tr")
    // create-then-truncate DDL scripts: a never-written declared table
    // truncates as a no-op (-1 = no version), not an error
    spark.sql("CREATE TABLE cat_tr2 (id INT) USING graft " +
      "TBLPROPERTIES('graft.keys'='id')")
    assert(spark.sql("TRUNCATE TABLE cat_tr2").first.getInt(0) == -1)
    spark.sql("DROP TABLE cat_tr2")
  }

  test("type widening interplay: change feed spans the boundary, " +
      "matview keeps refreshing, OPTIMIZE materializes") {
    val dir = tmp("widenx")
    val (src, view) = (s"$dir/src", s"$dir/view")
    VersionedTable.upsert(spark, src,
      Seq((1, "a", 10), (2, "b", 20)).toDF("id", "g", "x"),
      Seq("id", "g"), Seq("g"))                                    // v0 int
    graft.ops.MatView.create(spark, view, src, Seq("id", "g"),
      Seq("g"), sums = Seq(("x_sum", "x")), countAlias = Some("n"))
    VersionedTable.widenColumn(spark, src, "x", // v1: x -> bigint
      org.apache.spark.sql.types.LongType)
    VersionedTable.upsert(spark, src, // v2: long values land
      Seq((3, "a", 5000000000L), (1, "a", 11L)).toDF("id", "g", "x"),
      Seq("id", "g"), Seq("g"))
    // change feed v0 -> v2 crosses the widening: pre-images read int
    // files, post-images long — the union must coerce, not fail
    val feed = VersionedTable.changeFeedCdf(spark, src,
      Seq("id", "g"), 0, 2).collect()
    assert(feed.nonEmpty)
    // matview refresh across the boundary stays exact
    graft.ops.MatView.refresh(spark, view)
    val got = graft.ops.MatView.read(spark, view)
      .select($"g", $"x_sum", $"n").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", 5000000011L, 2L), ("b", 20L, 1L)))
    // OPTIMIZE materializes the widening into the files; reads agree
    VersionedTable.compact(spark, src)
    assert(VersionedTable.read(spark, src)
      .agg(sum($"x")).first.getLong(0) == 5000000031L)
    // the widened column keeps pruning through re-tagged stats: two
    // fresh indexed files with disjoint x ranges — the miss must SKIP
    VersionedTable.upsert(spark, src,
      Seq((9, "c", 99L)).toDF("id", "g", "x"),
      Seq("id", "g"), Seq("g"), statsCols = Seq("x"))
    VersionedTable.upsert(spark, src,
      Seq((10, "d", 5L)).toDF("id", "g", "x"),
      Seq("id", "g"), Seq("g"), statsCols = Seq("x"))
    val (kept, total) = VersionedTable.skipStats(spark, src, "x",
      98L, 100L)
    assert(total >= 2 && kept < total,
      s"widened stats stopped pruning: $kept/$total")
  }

  test("CREATE OR REPLACE TABLE: redefinition under the old name — new " +
      "schema/keys, constraints reset, history time-travels") {
    val path = tmp("repl") + "/t"
    spark.sql(s"CREATE TABLE cat_rp (id INT, g STRING, v INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_rp VALUES (1,'a',10)") // v0
    spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
      "'owner'='x')")                                  // v1
    // plain REPLACE on an unregistered name refuses
    intercept[Exception](spark.sql(
      "REPLACE TABLE cat_rp_missing (a INT) USING graft " +
        "TBLPROPERTIES('graft.keys'='a')"))
    // redefine: different schema, different keys, unpartitioned
    spark.sql(
      """CREATE OR REPLACE TABLE cat_rp (k BIGINT, name STRING)
        |USING graft TBLPROPERTIES('graft.keys'='k')""".stripMargin)
    assert(spark.sql("SELECT * FROM cat_rp").columns.toSeq ==
      Seq("k", "name"))
    assert(spark.sql("SELECT count(*) AS n FROM cat_rp")
      .first.getLong(0) == 0)
    // properties reset with the definition
    assert(!VersionedTable.propertiesOf(spark, path).contains("owner"))
    spark.sql("INSERT INTO cat_rp VALUES (5, 'five'), (6, 'six')")
    spark.sql("INSERT INTO cat_rp VALUES (5, 'FIVE')") // keyed upsert
    assert(spark.sql("SELECT name FROM cat_rp WHERE k = 5")
      .first.getString(0) == "FIVE")
    // the pre-replace generation still time travels under ITS schema
    assert(spark.sql("SELECT v FROM cat_rp VERSION AS OF 0")
      .first.getInt(0) == 10)
    // RTAS: replace with query-defined schema + content in one statement
    spark.sql(
      """CREATE OR REPLACE TABLE cat_rp USING graft
        |TBLPROPERTIES('graft.keys'='id')
        |AS SELECT 9 AS id, 2.5D AS score""".stripMargin)
    assert(spark.sql("SELECT score FROM cat_rp WHERE id = 9")
      .first.getDouble(0) == 2.5)
    // LOCATION cannot silently change
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE OR REPLACE TABLE cat_rp (z INT) USING graft " +
        s"LOCATION '${tmp("repl2")}/other' TBLPROPERTIES('graft.keys'='z')"))
    // DROP unregisters the name only; CREATE OR REPLACE over the still-
    // written root must REPLACE the content, never silently re-attach it
    spark.sql("DROP TABLE cat_rp")
    spark.sql(
      s"""CREATE OR REPLACE TABLE cat_rp (a INT, b STRING) USING graft
         |LOCATION '$path' TBLPROPERTIES('graft.keys'='a',
         |  'graft.stats'='b')""".stripMargin)
    assert(spark.sql("SELECT count(*) AS n FROM cat_rp")
      .first.getLong(0) == 0)
    assert(spark.sql("SELECT * FROM cat_rp").columns.toSeq ==
      Seq("a", "b"))
    // declared index coverage survives the replace: the FIRST write to
    // the emptied manifest starts the stats family from the entry
    spark.sql("INSERT INTO cat_rp VALUES (1,'m'), (2,'z')")
    val rootNow = graft.plans.GraftCatalog.lookup(spark, "cat_rp").get.root
    val (kept, total) = VersionedTable.skipStats(spark, rootNow, "b",
      "y", "zz")
    assert(total >= 1 && kept < total,
      s"declared stats lost through REPLACE: $kept/$total")
    // SHOW CREATE TABLE keeps the declarations round-trippable even on
    // the empty redefined manifest
    spark.sql("TRUNCATE TABLE cat_rp")
    assert(spark.sql("SHOW CREATE TABLE cat_rp").first.getString(0)
      .contains("'graft.stats'='b'"))
    spark.sql("DROP TABLE cat_rp")
  }

  test("ADD/DROP CONSTRAINT through Spark's constraint grammar: backlog " +
      "validated, writes gate, drop releases") {
    val path = tmp("cons") + "/t"
    spark.sql(s"CREATE TABLE cat_ck (id INT, v INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_ck VALUES (1, 10), (2, 20)")
    // a constraint the backlog violates refuses at registration
    intercept[Exception](spark.sql(
      "ALTER TABLE cat_ck ADD CONSTRAINT v_big CHECK (v > 15)"))
    spark.sql("ALTER TABLE cat_ck ADD CONSTRAINT v_pos CHECK (v > 0)")
    // every later write gates on it — and the violating INSERT commits
    // nothing
    intercept[Exception](
      spark.sql("INSERT INTO cat_ck VALUES (3, -5)"))
    assert(spark.sql("SELECT count(*) AS n FROM cat_ck")
      .first.getLong(0) == 2)
    spark.sql("INSERT INTO cat_ck VALUES (3, 5)")
    // visible in DESCRIBE DETAIL, released by DROP CONSTRAINT
    assert(spark.sql("DESCRIBE DETAIL cat_ck").first.getString(3)
      .contains("v_pos"))
    spark.sql("ALTER TABLE cat_ck DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO cat_ck VALUES (4, -1)") // gate released
    assert(spark.sql("SELECT count(*) AS n FROM cat_ck")
      .first.getLong(0) == 4)
    intercept[Exception](spark.sql(
      "ALTER TABLE cat_ck DROP CONSTRAINT never_was"))
    spark.sql("DROP TABLE cat_ck")
  }

  test("DML on a materialized view refuses — writes go to the source") {
    val path = tmp("mvdml") + "/src"
    spark.sql(s"CREATE TABLE cat_mvd_src (id INT, g STRING, x INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_mvd_src VALUES (1,'a',10)")
    spark.sql(
      """CREATE MATERIALIZED VIEW cat_mvd KEYED BY (id, g) AS
        |SELECT g, sum(x) AS x_sum FROM cat_mvd_src GROUP BY g"""
        .stripMargin)
    val e = intercept[IllegalArgumentException](
      spark.sql("INSERT INTO cat_mvd VALUES ('a', 5)"))
    assert(e.getMessage.contains("materialized view"))
    intercept[IllegalArgumentException](
      spark.sql("DELETE FROM cat_mvd WHERE g = 'a'"))
    intercept[IllegalArgumentException](
      spark.sql("UPDATE cat_mvd SET x_sum = 0"))
    assert(spark.sql("SELECT x_sum FROM cat_mvd").first.getLong(0) == 10L)
    spark.sql("DROP TABLE cat_mvd")
    spark.sql("DROP TABLE cat_mvd_src")
  }

  test("CREATE TABLE with transform partitioning: day(ts) / " +
      "bucket(n, id) in ONE statement — writes compute the column, " +
      "source predicates prune, keys must cover the source") {
    val path = tmp("txf") + "/t"
    // the source column must be a merge key (pure-function contract)
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE cat_txf_bad (id INT, ts TIMESTAMP, v BIGINT) " +
        s"USING graft LOCATION '${path}_bad' PARTITIONED BY (day(ts)) " +
        "TBLPROPERTIES('graft.keys'='id')"))
    spark.sql(
      s"""CREATE TABLE cat_txf (id INT, ts TIMESTAMP, v BIGINT)
         |USING graft LOCATION '$path' PARTITIONED BY (day(ts))
         |TBLPROPERTIES('graft.keys'='id,ts')""".stripMargin)
    // a user-declared transform column of the WRONG type refuses at
    // CREATE (registration after the first write could never succeed)
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE cat_txf_bad2 (id INT, ts TIMESTAMP, " +
        s"ts_day STRING) USING graft LOCATION '${path}_bad2' " +
        "PARTITIONED BY (day(ts)) TBLPROPERTIES('graft.keys'='id,ts')"))
    val rows = for (d <- 1 to 10; h <- 0 until 24) yield
      (d * 100 + h, java.sql.Timestamp.valueOf(
        f"2024-02-$d%02d $h%02d:00:00"), d.toLong)
    rows.toDF("id", "ts", "v").createOrReplaceTempView("cat_txf_src")
    // first INSERT: derives ts_day, registers the transform
    spark.sql("INSERT INTO cat_txf SELECT * FROM cat_txf_src")
    assert(VersionedTable.derivedPartitionsOf(spark,
      graft.plans.GraftCatalog.resolve(spark, "cat_txf").get)
      .get("ts_day").contains(("day", "ts")))
    val total = VersionedTable.physicalInputFiles(
      spark.sql("SELECT * FROM cat_txf"))
    assert(spark.sql("SELECT count(*) AS n FROM cat_txf")
      .first.getLong(0) == 240 && total >= 10)
    // the query names ONLY ts — the registration prunes dirs
    val ranged = spark.sql("SELECT * FROM cat_txf WHERE " +
      "ts >= TIMESTAMP'2024-02-04 06:00:00' AND " +
      "ts <= TIMESTAMP'2024-02-06 18:00:00'")
    assert(VersionedTable.physicalInputFiles(ranged) <= total * 3 / 10,
      "day-transform pruning did not bite")
    assert(ranged.count() == 18 + 24 + 19)
    // second INSERT goes through the REGISTERED path: computes the
    // column, keyed upsert replaces (same id+ts), count unchanged
    spark.sql("INSERT INTO cat_txf SELECT id, ts, v * 10 AS v " +
      "FROM cat_txf_src WHERE id = 101")
    assert(spark.sql("SELECT count(*) AS n FROM cat_txf")
      .first.getLong(0) == 240)
    assert(spark.sql("SELECT v FROM cat_txf WHERE id = 101")
      .first.getLong(0) == 10L)
    // canonical MERGE computes the transform column too
    rows.take(3).map { case (i, t, v) => (i, t, v + 1000) }
      .toDF("id", "ts", "v").createOrReplaceTempView("cat_txf_m")
    spark.sql(
      """MERGE INTO cat_txf t USING cat_txf_m s
        |ON t.id = s.id AND t.ts = s.ts
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT v FROM cat_txf WHERE id = 100")
      .first.getLong(0) == 1001L)
    assert(spark.sql("SELECT count(*) AS n FROM cat_txf")
      .first.getLong(0) == 240)
    // SHOW CREATE round-trips the one-statement transform layout (the
    // generated column stays out of the column list, as written)
    val ddl = spark.sql("SHOW CREATE TABLE cat_txf").first.getString(0)
    assert(ddl.contains("PARTITIONED BY (day(ts))") &&
      !ddl.contains("ts_day"), ddl)
    // DESCRIBE surfaces the transform on its partition rows
    assert(spark.sql("DESCRIBE cat_txf").collect().exists(r =>
      r.getString(0) == "ts_day" && r.getString(2) == "day(ts)"))
    // column DEFAULTs are lifecycle metadata — CREATE refuses them
    // instead of silently dropping
    val cd = intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE cat_txf_cd (id INT, s STRING DEFAULT 'x') " +
        s"USING graft LOCATION '${path}_cd' " +
        "TBLPROPERTIES('graft.keys'='id')"))
    assert(cd.getMessage.contains("DEFAULT"))
    // bucket transform: CTAS with bucket(8, id), equality prunes
    spark.sql(
      s"""CREATE TABLE cat_txfb USING graft LOCATION '${path}_b'
         |PARTITIONED BY (bucket(8, id))
         |TBLPROPERTIES('graft.keys'='id,ts')
         |AS SELECT * FROM cat_txf_src""".stripMargin)
    val totalB = VersionedTable.physicalInputFiles(
      spark.sql("SELECT * FROM cat_txfb"))
    val eqB = spark.sql("SELECT * FROM cat_txfb WHERE id = 512")
    assert(VersionedTable.physicalInputFiles(eqB) <= totalB / 4,
      "bucket-transform pruning did not bite")
    assert(eqB.count() == 1)
    spark.sql("DROP TABLE cat_txfb")
    spark.sql("DROP TABLE cat_txf")
  }

  test("SQL index DDL: CREATE/REFRESH DEDUP and ANN INDEX by name, " +
      "queried through the graft_dedup_pairs / graft_ann_topk TVFs") {
    val path = tmp("sqlidx")
    def sent(tail: String) =
      s"the quick brown fox jumps over the lazy $tail and rests there"
    // --- dedup ---
    spark.sql(s"CREATE TABLE cat_docs (doc_id BIGINT, text STRING, " +
      s"lang STRING) USING graft LOCATION '$path/docs' " +
      "PARTITIONED BY (lang) TBLPROPERTIES('graft.keys'='doc_id,lang')")
    spark.sql("INSERT INTO cat_docs VALUES " +
      s"(1, '${sent("dog")}', 'en'), (2, '${sent("cat")}', 'en'), " +
      "(3, 'completely different words entirely here now', 'en')")
    assert(spark.sql("CREATE DEDUP INDEX cat_di ON cat_docs " +
      "(doc_id, text) OPTIONS('shingle'='2')").first.getInt(0) >= 0)
    Seq((10L, sent("dog"))).toDF("doc_id", "text")
      .createOrReplaceTempView("cat_di_batch")
    val pairs = spark.sql("SELECT new_id, corpus_id FROM " +
      "graft_dedup_pairs('cat_di', 'cat_di_batch', 0.7)")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)) && !pairs.exists(_._2 == 3L))
    // CDC refresh through SQL: new doc lands, the index sees it
    spark.sql(s"INSERT INTO cat_docs VALUES (4, '${sent("dog")}', 'en')")
    spark.sql("REFRESH DEDUP INDEX cat_di")
    val pairs2 = spark.sql("SELECT corpus_id FROM " +
      "graft_dedup_pairs('cat_di', 'cat_di_batch', 0.7)")
      .as[Long].collect().toSet
    assert(pairs2.contains(4L), s"refreshed index missing doc 4: $pairs2")
    // name collision with a table refuses
    intercept[IllegalArgumentException](spark.sql(
      "CREATE DEDUP INDEX cat_docs ON cat_docs (doc_id, text)"))
    // --- ann ---
    spark.sql(s"CREATE TABLE cat_vecs (vec_id BIGINT, " +
      s"embedding ARRAY<FLOAT>, grp INT) USING graft " +
      s"LOCATION '$path/vecs' PARTITIONED BY (grp) " +
      "TBLPROPERTIES('graft.keys'='vec_id,grp')")
    val vecs = (0L until 20L).map { i =>
      val r = new scala.util.Random(i)
      (i, Seq.fill(4)(r.nextFloat()), (i % 2).toInt)
    }
    vecs.toDF("vec_id", "embedding", "grp")
      .createOrReplaceTempView("cat_vec_src")
    spark.sql("INSERT INTO cat_vecs SELECT * FROM cat_vec_src")
    spark.sql("CREATE ANN INDEX cat_ai ON cat_vecs " +
      "(vec_id, embedding) OPTIONS('nlist'='4','kmeans'='1')")
    Seq((100L, vecs(3)._2)).toDF("vec_id", "embedding")
      .createOrReplaceTempView("cat_ai_q")
    // nProbe = nlist: exact — the self-identical vector ranks first
    val top = spark.sql("SELECT neighbor_id FROM " +
      "graft_ann_topk('cat_ai', 'cat_ai_q', 3, 4) WHERE rank = 1")
      .as[Long].head()
    assert(top == 3L, s"nearest neighbor wrong: $top")
    spark.sql("INSERT INTO cat_vecs SELECT 50L, embedding, 0 " +
      "FROM cat_vec_src WHERE vec_id = 3")
    spark.sql("REFRESH ANN INDEX cat_ai")
    val top2 = spark.sql("SELECT neighbor_id FROM " +
      "graft_ann_topk('cat_ai', 'cat_ai_q', 2, 4)")
      .as[Long].collect().toSet
    assert(top2 == Set(3L, 50L), s"refreshed ANN wrong: $top2")
    spark.sql("DROP TABLE cat_ai"); spark.sql("DROP TABLE cat_di")
    spark.sql("DROP TABLE cat_vecs"); spark.sql("DROP TABLE cat_docs")
  }

  test("index SQL lifecycle: SHOW GRAFT INDEXES, DESCRIBE ... INDEX, " +
      "DROP ... INDEX with kind checks, drop-then-recreate, and " +
      "TVF-on-dropped-index loud refusal") {
    val path = tmp("idxlife")
    def sent(tail: String) =
      s"the quick brown fox jumps over the lazy $tail and rests there"
    spark.sql(s"CREATE TABLE cat_ldocs (doc_id BIGINT, text STRING, " +
      s"lang STRING) USING graft LOCATION '$path/docs' " +
      "PARTITIONED BY (lang) TBLPROPERTIES('graft.keys'='doc_id,lang')")
    spark.sql("INSERT INTO cat_ldocs VALUES " +
      s"(1, '${sent("dog")}', 'en'), (2, '${sent("cat")}', 'en')")
    spark.sql(s"CREATE TABLE cat_lvecs (vec_id BIGINT, " +
      s"embedding ARRAY<FLOAT>, grp INT) USING graft " +
      s"LOCATION '$path/vecs' PARTITIONED BY (grp) " +
      "TBLPROPERTIES('graft.keys'='vec_id,grp')")
    (0L until 12L).map(i =>
      (i, Seq.tabulate(4)(j => (i + j + 1).toFloat / 12f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "grp")
      .createOrReplaceTempView("cat_lvec_src")
    spark.sql("INSERT INTO cat_lvecs SELECT * FROM cat_lvec_src")
    spark.sql("CREATE DEDUP INDEX cat_ldi ON cat_ldocs (doc_id, text) " +
      "OPTIONS('shingle'='2')")
    spark.sql("CREATE ANN INDEX cat_lai ON cat_lvecs (vec_id, embedding) " +
      "OPTIONS('nlist'='2','kmeans'='1')")
    // SHOW enumerates both, kind-tagged, pointing at their sources;
    // plain tables do not appear
    val shown = spark.sql("SHOW GRAFT INDEXES").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(shown.contains(("cat_ldi", "DEDUP")) &&
      shown.contains(("cat_lai", "ANN")), s"SHOW wrong: $shown")
    assert(!shown.exists(_._1 == "cat_ldocs"))
    // DESCRIBE: params + sync state (fresh index: synced == current)
    val d = spark.sql("DESCRIBE DEDUP INDEX cat_ldi").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(d("kind") == "DEDUP" && d("shingle_n") == "2" &&
      d("bands") == "32" && d("id_col") == "doc_id")
    assert(d("synced_source_version") == "0" &&
      d("source_current_version") == "0", d.toString)
    val da = spark.sql("DESCRIBE ANN INDEX cat_lai").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(da("kind") == "ANN" && da("nlist") == "2" &&
      da("vector_col") == "embedding" && da("quantized") == "false")
    // quantized variant through the SQL surface: OPTIONS + DESCRIBE +
    // TVF answers match the float index's at nProbe = nlist
    spark.sql("CREATE ANN INDEX cat_laq ON cat_lvecs " +
      "(vec_id, embedding) OPTIONS('nlist'='2','kmeans'='1'," +
      "'quantized'='true')")
    assert(spark.sql("DESCRIBE ANN INDEX cat_laq").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
      .apply("quantized") == "true")
    spark.sql("SELECT embedding FROM cat_lvecs WHERE vec_id = 3")
      .select(col("embedding")).collect()
    Seq((200L, Seq.tabulate(4)(j => (3L + j + 1).toFloat / 12f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("cat_laq_q")
    val fq = spark.sql("SELECT neighbor_id, round(cosine_sim, 9) FROM " +
      "graft_ann_topk('cat_lai', 'cat_laq_q', 3, 2)")
      .collect().map(_.mkString("|")).toSet
    val qq = spark.sql("SELECT neighbor_id, round(cosine_sim, 9) FROM " +
      "graft_ann_topk('cat_laq', 'cat_laq_q', 3, 2)")
      .collect().map(_.mkString("|")).toSet
    assert(fq == qq, s"quantized TVF diverged: $fq vs $qq")
    spark.sql("DROP ANN INDEX cat_laq")
    // source moves: DESCRIBE shows the index behind
    spark.sql(s"INSERT INTO cat_ldocs VALUES (9, '${sent("owl")}', 'en')")
    val d2 = spark.sql("DESCRIBE DEDUP INDEX cat_ldi").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(d2("synced_source_version") == "0" &&
      d2("source_current_version") == "1", d2.toString)
    // kind mismatch is ALWAYS loud — even with IF EXISTS
    val km = intercept[IllegalArgumentException](
      spark.sql("DROP ANN INDEX cat_ldi"))
    assert(km.getMessage.contains("DEDUP index"), km.getMessage)
    intercept[IllegalArgumentException](
      spark.sql("DROP DEDUP INDEX IF EXISTS cat_lai"))
    // DROP removes the artifact and the name
    spark.sql("DROP DEDUP INDEX cat_ldi")
    assert(!spark.sql("SHOW GRAFT INDEXES").collect()
      .exists(_.getString(0) == "cat_ldi"))
    // TVF on the dropped index refuses loudly, as does REFRESH
    Seq((10L, sent("dog"))).toDF("doc_id", "text")
      .createOrReplaceTempView("cat_ldi_batch")
    val tvf = intercept[Exception](spark.sql(
      "SELECT * FROM graft_dedup_pairs('cat_ldi', 'cat_ldi_batch', 0.7)")
      .collect())
    assert(tvf.getMessage.contains("cat_ldi") ||
      tvf.getMessage.contains("no dedup index"), tvf.getMessage)
    intercept[Exception](spark.sql("REFRESH DEDUP INDEX cat_ldi"))
    // drop-then-RECREATE by the same name lands on a clean root
    spark.sql("CREATE DEDUP INDEX cat_ldi ON cat_ldocs (doc_id, text) " +
      "OPTIONS('shingle'='2')")
    val pairs = spark.sql("SELECT corpus_id FROM " +
      "graft_dedup_pairs('cat_ldi', 'cat_ldi_batch', 0.7)")
      .as[Long].collect().toSet
    assert(pairs.contains(1L), s"recreated index broken: $pairs")
    // unregistered name: loud without IF EXISTS, silent with
    intercept[NoSuchElementException](
      spark.sql("DROP ANN INDEX cat_nothere"))
    spark.sql("DROP ANN INDEX IF EXISTS cat_nothere")
    // path-addressed drop works too
    spark.sql("DROP ANN INDEX cat_lai")
    spark.sql("DROP DEDUP INDEX cat_ldi")
    spark.sql("DROP TABLE cat_lvecs"); spark.sql("DROP TABLE cat_ldocs")
  }

  test("bare OPTIMIZE honors declared graft.zorder clustering") {
    val path = tmp("zopt") + "/t"
    spark.sql(s"CREATE TABLE cat_zopt (id INT, x INT, y INT, g STRING) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    val rows = (0 until 8192).map(i =>
      (i, i % 64, (i / 64) % 64, "all"))
    rows.toDF("id", "x", "y", "g").createOrReplaceTempView("cat_zopt_src")
    spark.sql("INSERT INTO cat_zopt SELECT * FROM cat_zopt_src")
    // declare the clustering ONCE; the maintenance job's bare OPTIMIZE
    // applies it — unknown columns refuse loudly
    spark.sql("ALTER TABLE cat_zopt SET TBLPROPERTIES" +
      "('graft.zorder'='nope')")
    intercept[IllegalArgumentException](spark.sql("OPTIMIZE cat_zopt"))
    spark.sql("ALTER TABLE cat_zopt SET TBLPROPERTIES" +
      "('graft.zorder'='x,y', 'graft.filerows'='256')")
    assert(spark.sql("OPTIMIZE cat_zopt").first.getInt(0) > 0)
    // both z dimensions skip after the property-driven rewrite
    val root = graft.plans.GraftCatalog.resolve(spark, "cat_zopt").get
    val (kx, tx) = VersionedTable.skipStats(spark, root, "x", 3, 4)
    val (ky, ty) = VersionedTable.skipStats(spark, root, "y", 3, 4)
    assert(kx < tx && ky < ty,
      s"declared z-order did not cluster: x $kx/$tx, y $ky/$ty")
    spark.sql("DROP TABLE cat_zopt")
  }

  test("INSERT-time schema evolution: refused without the property, " +
      "admitted with it, old generations surface NULL") {
    val path = tmp("insev") + "/t"
    spark.sql(s"CREATE TABLE cat_ev (id INT, g STRING, x INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_ev VALUES (1,'a',10), (2,'b',20)")
    Seq((3, "a", 30, "fresh"), (4, "b", 40, "fresh"))
      .toDF("id", "g", "x", "src").createOrReplaceTempView("cat_ev_wide")
    // without the flag: loud refusal naming the columns and the knob
    val e = intercept[IllegalArgumentException](spark.sql(
      "INSERT INTO cat_ev BY NAME SELECT * FROM cat_ev_wide"))
    assert(e.getMessage.contains("src") &&
      e.getMessage.contains("graft.schema.evolution"))
    // with it: the INSERT widens the schema; pre-evolution rows NULL
    spark.sql("ALTER TABLE cat_ev SET TBLPROPERTIES" +
      "('graft.schema.evolution'='true')")
    spark.sql("INSERT INTO cat_ev BY NAME SELECT * FROM cat_ev_wide")
    val rows = spark.sql(
      "SELECT id, src FROM cat_ev ORDER BY id").collect()
    assert(rows.map(r => (r.getInt(0), Option(r.getString(1))))
      .toSeq == Seq((1, None), (2, None),
        (3, Some("fresh")), (4, Some("fresh"))))
    // explicit column lists evolve too; positional never can (count
    // mismatch refuses first)
    spark.sql("INSERT INTO cat_ev (id, g, x, src, extra2) " +
      "SELECT 5, 'a', 50, 'fresh', CAST(1.5 AS DOUBLE)")
    assert(spark.sql("SELECT extra2 FROM cat_ev WHERE id = 5")
      .first.getDouble(0) == 1.5)
    intercept[IllegalArgumentException](spark.sql(
      "INSERT INTO cat_ev VALUES (6,'a',60)")) // positional now 5 cols
    spark.sql("DROP TABLE cat_ev")
  }

  test("named logical views: create/query/drop, late binding, " +
      "view-over-view, OR REPLACE, cycles, shadowing, DML refusal, " +
      "namespace collision") {
    val path = tmp("view") + "/t"
    spark.sql(s"CREATE TABLE cat_vt (id INT, g STRING, x INT) " +
      s"USING graft LOCATION '$path' PARTITIONED BY (g) " +
      "TBLPROPERTIES('graft.keys'='id,g')")
    spark.sql("INSERT INTO cat_vt VALUES (1,'a',10), (2,'b',20), (3,'a',30)")
    spark.sql(
      "CREATE VIEW cat_v1 AS SELECT g, sum(x) AS sx FROM cat_vt GROUP BY g")
    assert(spark.sql("SELECT sx FROM cat_v1 WHERE g = 'a'")
      .first.getLong(0) == 40L)
    // LATE binding: new source rows show through without redefinition
    spark.sql("INSERT INTO cat_vt VALUES (4,'a',60)")
    assert(spark.sql("SELECT sx FROM cat_v1 WHERE g = 'a'")
      .first.getLong(0) == 100L)
    // view-over-view composes (and works inside CTEs/joins)
    spark.sql("CREATE VIEW cat_v2 AS SELECT g, sx * 2 AS sx2 FROM cat_v1")
    assert(spark.sql(
      """WITH w AS (SELECT * FROM cat_v2 WHERE g = 'a')
        |SELECT sx2 FROM w""".stripMargin).first.getLong(0) == 200L)
    assert(spark.sql("SHOW GRAFT VIEWS").collect()
      .map(_.getString(0)).toSet == Set("cat_v1", "cat_v2"))
    // plain CREATE refuses a second definition; OR REPLACE redefines
    intercept[IllegalArgumentException](spark.sql(
      "CREATE VIEW cat_v1 AS SELECT 1 AS one"))
    spark.sql("CREATE OR REPLACE VIEW cat_v2 AS " +
      "SELECT g, sx * 3 AS sx2 FROM cat_v1")
    assert(spark.sql("SELECT sx2 FROM cat_v2 WHERE g = 'a'")
      .first.getLong(0) == 300L)
    // a body that does not analyze refuses at CREATE, not first read
    intercept[Exception](spark.sql(
      "CREATE VIEW cat_v_bad AS SELECT nope FROM cat_vt"))
    assert(spark.sql("SHOW GRAFT VIEWS").collect()
      .forall(_.getString(0) != "cat_v_bad"))
    // cycle: redefine v1 over v2 (which reads v1) — loud at read
    spark.sql("CREATE OR REPLACE VIEW cat_v1 AS " +
      "SELECT g, sx2 AS sx FROM cat_v2")
    val cyc = intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM cat_v1").collect())
    assert(cyc.getMessage.contains("circular view reference"))
    spark.sql("CREATE OR REPLACE VIEW cat_v1 AS " +
      "SELECT g, sum(x) AS sx FROM cat_vt GROUP BY g")
    // Spark's resolution order: a temp view of the name shadows it
    Seq((99L, "z")).toDF("sx", "g").createOrReplaceTempView("cat_v1")
    assert(spark.sql("SELECT sx FROM cat_v1").first.getLong(0) == 99L)
    // ... and shadows DROP VIEW too (Spark drops the temp view)
    spark.sql("DROP VIEW cat_v1")
    assert(spark.sql("SELECT sx FROM cat_v1 WHERE g = 'a'")
      .first.getLong(0) == 100L)
    // DML on a view refuses loudly
    val dml = intercept[IllegalArgumentException](
      spark.sql("DELETE FROM cat_v1 WHERE g = 'a'"))
    assert(dml.getMessage.contains("graft VIEW"))
    intercept[IllegalArgumentException](
      spark.sql("INSERT INTO cat_v1 VALUES ('a', 1)"))
    // tables and views share the namespace, both directions
    intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE cat_v1 (id INT) USING graft LOCATION '$path'" +
        "TBLPROPERTIES('graft.keys'='id')"))
    intercept[IllegalArgumentException](spark.sql(
      "CREATE VIEW cat_vt AS SELECT 1 AS one"))
    // a persistent view cannot capture a session temp view (it would
    // break in every other session) — but a body-defined CTE of the
    // same name is not a capture
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("cat_v_tmp")
    val cap = intercept[IllegalArgumentException](spark.sql(
      "CREATE VIEW cat_v_capt AS SELECT * FROM cat_v_tmp"))
    assert(cap.getMessage.contains("temp view"))
    spark.sql("CREATE VIEW cat_v_cte AS WITH cat_v_tmp AS " +
      "(SELECT 9 AS a) SELECT a FROM cat_v_tmp")
    assert(spark.sql("SELECT a FROM cat_v_cte").first.getInt(0) == 9)
    spark.sql("DROP VIEW cat_v_cte")
    spark.sql("DROP VIEW cat_v2")
    spark.sql("DROP VIEW cat_v1")
    // unregistered now -> falls through to Spark's own resolution/error
    intercept[Exception](spark.sql("DROP VIEW cat_v1"))
    spark.sql("DROP VIEW IF EXISTS cat_v1") // silent
    spark.sql("DROP TABLE cat_vt")
  }

  test("view bodies ignore session temp-view shadows: a temp view " +
      "created AFTER the view cannot hijack its tables") {
    val path = tmp("vshadow") + "/t"
    spark.sql(s"CREATE TABLE cat_vsh_t (id INT, v INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_vsh_t VALUES (1, 10), (2, 20)")
    spark.sql("CREATE VIEW cat_vsh_v AS " +
      "SELECT sum(v) AS sv FROM cat_vsh_t")
    assert(spark.sql("SELECT sv FROM cat_vsh_v").first.getLong(0) == 30L)
    // a later temp view named like the TABLE shadows direct reads
    // (Spark's order) but must NOT reach inside the persistent body —
    // the CREATE-time "no session state" rule holds at read time too
    Seq((9, 900)).toDF("id", "v").createOrReplaceTempView("cat_vsh_t")
    assert(spark.sql("SELECT sum(v) FROM cat_vsh_t")
      .first.getLong(0) == 900L) // direct: temp view wins
    assert(spark.sql("SELECT sv FROM cat_vsh_v")
      .first.getLong(0) == 30L)  // through the view: graft table wins
    spark.sql("DROP VIEW cat_vsh_v")
    spark.catalog.dropTempView("cat_vsh_t")
    spark.sql("DROP TABLE cat_vsh_t")
  }

  test("view body over a dropped table shadowed by a temp view " +
      "refuses loudly instead of serving session state") {
    val path = tmp("vshadow2") + "/t"
    spark.sql(s"CREATE TABLE cat_vs2_t (id INT) USING graft " +
      s"LOCATION '$path' TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_vs2_t VALUES (1)")
    spark.sql("CREATE VIEW cat_vs2_v AS SELECT id FROM cat_vs2_t")
    spark.sql("DROP TABLE cat_vs2_t")
    Seq((42)).toDF("id").createOrReplaceTempView("cat_vs2_t")
    val e = intercept[IllegalArgumentException](
      spark.sql("SELECT id FROM cat_vs2_v").collect())
    assert(e.getMessage.contains("session temp view"), e.getMessage)
    spark.sql("DROP VIEW cat_vs2_v")
    spark.catalog.dropTempView("cat_vs2_t")
  }

  test("view body over a PERSISTENT session-catalog table keeps " +
      "resolving — only temp views are refused session state") {
    // a plain (non-graft, non-temp) catalog table is durable state a
    // view may legitimately capture; the temp-view refusal must not
    // catch it
    spark.sql("DROP TABLE IF EXISTS cat_vs3_mt")
    spark.sql("CREATE TABLE cat_vs3_mt (x INT) USING parquet")
    spark.sql("INSERT INTO cat_vs3_mt VALUES (7), (8)")
    spark.sql("CREATE VIEW cat_vs3_v AS SELECT sum(x) AS sx FROM cat_vs3_mt")
    assert(spark.sql("SELECT sx FROM cat_vs3_v").first.getLong(0) == 15L)
    spark.sql("DROP VIEW cat_vs3_v")
    spark.sql("DROP TABLE cat_vs3_mt")
  }

  test("DROP INDEX completes a drop that crashed after the storage " +
      "delete; a plain table root is never touched") {
    val idxName = "cat_halfdrop_idx"
    val srcPath = tmp("halfdrop") + "/src"
    spark.sql(s"CREATE TABLE cat_halfdrop_src (doc_id BIGINT, " +
      s"text STRING, grp INT) USING graft LOCATION '$srcPath' " +
      "TBLPROPERTIES('graft.keys'='doc_id,grp')")
    spark.sql("INSERT INTO cat_halfdrop_src VALUES " +
      "(1, 'a b c d', 0), (2, 'a b c d', 1)")
    spark.sql(s"CREATE DEDUP INDEX $idxName ON cat_halfdrop_src " +
      "(doc_id, text)")
    val idxRoot = graft.plans.GraftCatalog.resolve(spark, idxName).get
    // simulate the crash window: storage gone, name still registered
    val p = new org.apache.hadoop.fs.Path(idxRoot)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.sql(s"DROP DEDUP INDEX $idxName") // completes the crashed drop
    assert(graft.plans.GraftCatalog.resolve(spark, idxName).isEmpty)
    // and the name is creatable again
    spark.sql(s"CREATE DEDUP INDEX $idxName ON cat_halfdrop_src " +
      "(doc_id, text)")
    spark.sql(s"DROP DEDUP INDEX $idxName")
    // a TABLE root addressed by DROP INDEX refuses without deleting
    intercept[Exception] {
      spark.sql(s"DROP DEDUP INDEX graft.`$srcPath`")
    }
    assert(spark.sql("SELECT count(*) FROM cat_halfdrop_src")
      .first.getLong(0) == 2L, "DROP INDEX must never delete table data")
    spark.sql("DROP TABLE cat_halfdrop_src")
  }

  test("crash-completion keeps the kind check: with storage gone, the " +
      "catalog's recorded kind refuses a mismatched DROP statement") {
    val path = tmp("halfkind")
    spark.sql(s"CREATE TABLE cat_hk_vecs (vec_id BIGINT, " +
      s"embedding ARRAY<FLOAT>, grp INT) USING graft " +
      s"LOCATION '$path/vecs' PARTITIONED BY (grp) " +
      "TBLPROPERTIES('graft.keys'='vec_id,grp')")
    (0L until 8L).map(i =>
      (i, Seq.tabulate(4)(j => (i + j + 1).toFloat / 8f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "grp")
      .createOrReplaceTempView("cat_hk_src")
    spark.sql("INSERT INTO cat_hk_vecs SELECT * FROM cat_hk_src")
    spark.sql("CREATE ANN INDEX cat_hk_ai ON cat_hk_vecs " +
      "(vec_id, embedding) OPTIONS('nlist'='2','kmeans'='1')")
    val idxRoot = graft.plans.GraftCatalog.resolve(spark, "cat_hk_ai").get
    // the crash window: storage deleted, name still registered — the
    // spec sidecar can no longer witness the kind
    val p = new org.apache.hadoop.fs.Path(idxRoot)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val km = intercept[IllegalArgumentException](
      spark.sql("DROP DEDUP INDEX cat_hk_ai"))
    assert(km.getMessage.contains("ANN index"), km.getMessage)
    assert(graft.plans.GraftCatalog.resolve(spark, "cat_hk_ai").isDefined,
      "a kind-mismatched statement must not deregister the name")
    spark.sql("DROP ANN INDEX cat_hk_ai") // the matching kind completes
    assert(graft.plans.GraftCatalog.resolve(spark, "cat_hk_ai").isEmpty)
    spark.sql("DROP TABLE cat_hk_vecs")
  }

  test("INSERT-time schema evolution matches columns case-" +
      "insensitively: 'X' is the existing 'x', never a new column") {
    val path = tmp("insci") + "/t"
    spark.sql(s"CREATE TABLE cat_evci (id INT, g STRING, x INT) " +
      s"USING graft LOCATION '$path' " +
      "TBLPROPERTIES('graft.keys'='id')")
    spark.sql("INSERT INTO cat_evci VALUES (1,'a',10)")
    spark.sql("ALTER TABLE cat_evci SET TBLPROPERTIES" +
      "('graft.schema.evolution'='true')")
    Seq((2, "b", 20)).toDF("ID", "G", "X")
      .createOrReplaceTempView("cat_evci_src")
    spark.sql("INSERT INTO cat_evci BY NAME SELECT * FROM cat_evci_src")
    val t = spark.sql("SELECT * FROM cat_evci ORDER BY id")
    // schema did NOT fork: still exactly (id, g, x) in table casing
    assert(t.columns.toSeq == Seq("id", "g", "x"), t.columns.toSeq)
    assert(t.collect().map(r => (r.getInt(0), r.getString(1),
      r.getInt(2))).toSeq == Seq((1, "a", 10), (2, "b", 20)))
    spark.sql("DROP TABLE cat_evci")
  }
}
