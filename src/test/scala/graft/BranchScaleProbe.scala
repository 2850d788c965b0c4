package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.VersionedTable

/** Scale evidence for zero-copy branches: build the documents table at
  * 1× and N×, and price createBranch, a one-partition branch write, and
  * fastForward at both sizes. The claim under test: branch lifecycle
  * cost is METADATA-sized — create/fast-forward walls stay flat while
  * the table grows N×, and the branch write prices only its touched
  * partition. Print-and-judge probe (results recorded in BASELINE.md).
  *
  * Usage: Test/runMain graft.BranchScaleProbe [sfDir] [copies]
  */
object BranchScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .appName("branch-scale-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    def t[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-38s $s%.3f s")
      (r, s)
    }
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars")
    val n0 = docs0.count()

    def cycle(tag: String, mult: Int): (Double, Double, Double) = {
      val root = s"/tmp/graft_branch_probe/$tag/table"
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_branch_probe/$tag")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val docs = (0 until mult).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_.unionByName(_))
      t(s"[$tag] build ${n0 * mult} rows") {
        VersionedTable.upsert(spark, root, docs, Seq("doc_id", "lang"),
          Seq("lang"), statsCols = Seq("n_chars"), fileRows = Some(2000))
      }
      val (_, tCreate) = t(s"[$tag] createBranch") {
        VersionedTable.createBranch(spark, root, "dev")
      }
      val (_, tWrite) = t(s"[$tag] branch write (1 partition)") {
        VersionedTable.upsert(spark, s"$root@dev",
          docs0.filter(col("lang") === "en").limit(500)
            .withColumn("n_chars", col("n_chars") + 1),
          Seq("doc_id", "lang"), Seq("lang"))
      }
      val (_, tFf) = t(s"[$tag] fastForward") {
        VersionedTable.fastForward(spark, root, "dev")
      }
      (tCreate, tWrite, tFf)
    }

    val (c1, w1, f1) = cycle("x1", 1)
    val (cN, wN, fN) = cycle(s"x$copies", copies)
    println(f"[probe] table grew ${copies}x: createBranch ${cN / c1}%.2fx, " +
      f"branch write ${wN / w1}%.2fx, fastForward ${fN / f1}%.2fx " +
      "(flat = zero-copy/metadata-sized, write prices its partition only)")
    spark.stop()
  }
}
