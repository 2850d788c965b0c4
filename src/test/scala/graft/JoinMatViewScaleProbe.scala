package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{JoinMatView, VersionedTable}

/** Scale evidence for incremental JOIN-view maintenance: at growing FACT
  * sizes (1×, N×) against a fixed-size dimension, price (a) the initial
  * full build, (b) a fact-delta refresh after a FIXED-size fact batch
  * (the ΔF ⋈ D_new leg), (c) a dim-delta refresh after a 2-key dim
  * change (the F_old ⋈ ΔD leg, pruned to the changed keys' fact files).
  * The claim under test: both refresh legs track CHANGE volume, not fact
  * volume — (b) and (c) should stay near-flat while (a) grows with the
  * fact. Print-and-judge probe (results recorded in BASELINE.md), not an
  * assertion.
  *
  * Usage: Test/runMain graft.JoinMatViewScaleProbe [sfDir] [copies]
  */
object JoinMatViewScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("joinmatview-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = "/tmp/graft_joinmatview_probe"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // fact = orders (okey rows with a customer fk); dim = customer
    // (fixed size at every scale). The dim's merge key is (dbucket, cid)
    // with dbucket = cid % 16 — the scalable big-dim layout: partition
    // dirs stay O(buckets) however many customers exist (partitioning a
    // dim by its bare pk would mean one dir PER KEY), and the fact
    // carries the same derived column so the fk join aligns with the
    // dim's full key.
    val orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("okey"), col("o_custkey").as("cid"),
        (col("o_custkey") % 16).as("dbucket"),
        col("o_totalprice").as("amount"),
        (col("o_orderkey") % 7).as("bucket7"))
    val dim0 = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("cid"),
        (col("c_custkey") % 16).as("dbucket"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("bal"))
    val n0 = orders0.count()

    Seq(1, copies).foreach { mult =>
      val tag = s"${mult}x"
      val (fact, dim, view) =
        (s"$base/$tag/fact", s"$base/$tag/dim", s"$base/$tag/view")
      val facts = (0 until mult).map(i =>
        orders0.withColumn("okey", col("okey") + lit(i.toLong * 100000000L)))
        .reduce(_.unionByName(_))
      println(s"[probe] --- fact $tag: ${n0 * mult} rows, dim fixed ---")
      t(s"$tag fact build") {
        VersionedTable.upsert(spark, fact, facts, Seq("okey", "bucket7"),
          Seq("bucket7"), statsCols = Seq("okey"), bloomCols = Seq("cid"),
          fileRows = Some(50000))
      }
      t(s"$tag dim build") {
        VersionedTable.upsert(spark, dim, dim0, Seq("dbucket", "cid"),
          Seq("dbucket"), statsCols = Seq("cid"))
      }
      t(s"$tag view full build") {
        JoinMatView.create(spark, view, fact, dim,
          fkCols = Seq("dbucket", "cid"), groupCols = Seq("segment"),
          sums = Seq(("amt_sum", "amount")),
          avgs = Seq(("amt_avg", "amount")), countAlias = Some("n"))
      }
      // (b) FIXED-size fact change whatever the scale: 2000 updates +
      // 500 inserts
      val batch = orders0.limit(2500)
        .withColumn("okey",
          when(col("okey") % 5 === 0, col("okey") + lit(900000000L))
            .otherwise(col("okey")))
        .withColumn("amount", col("amount") + lit(17.0))
      VersionedTable.upsert(spark, fact, batch, Seq("okey", "bucket7"),
        Seq("bucket7"), statsCols = Seq("okey"), bloomCols = Seq("cid"))
      t(s"$tag fact-delta refresh (fixed 2.5k-row change)") {
        JoinMatView.refresh(spark, view)
      }
      assert(!JoinMatView.lastFullRecompute,
        "fixed-size fact change must stay on the delta path")
      // (c) 2-key dim change: one segment move + one balance touch —
      // the affected-key fact rescan must prune to those keys' files
      VersionedTable.upsert(spark, dim,
        dim0.limit(2).withColumn("segment", lit("MOVED")),
        Seq("dbucket", "cid"), Seq("dbucket"))
      t(s"$tag dim-delta refresh (2 changed keys)") {
        JoinMatView.refresh(spark, view)
      }
      assert(!JoinMatView.lastFullRecompute,
        "a 2-key dim change must stay on the delta path")
      println(s"[probe] $tag dim changed-keys " +
        s"${JoinMatView.lastDimChangedKeys} (expect 2)")
      val served = JoinMatView.read(spark, view)
        .agg(sum("n")).collect().head.getLong(0)
      println(s"[probe] $tag served joined-row count $served " +
        s"(expect ${n0 * mult + 500})")
    }
    spark.stop()
  }
}
