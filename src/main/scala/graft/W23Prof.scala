package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.Files
object W23Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, md5, when, year => yearOf}
    import org.apache.hadoop.fs.{Path => HPath}
    import graft.engine.{ManifestTable, SpecManifest}
    import graft.engine.SpecManifest.{Bucket, PartField, PartitionSpec, Year}
    import graft.sources.Tables
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[w23prof] $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    for (round <- 1 to 2) {
    Tables.registerAll(spark, dir)
    val root = Files.createTempDirectory("graft-w23p").toString
    val spec = PartitionSpec(Seq(PartField("y", "o_orderdate", Year), PartField("b", "o_custkey", Bucket(4))))
    val base = Tables.load(spark, dir, "orders")
      .select($"o_orderkey".cast("long").as("o_orderkey"),
        $"o_custkey".cast("long").as("o_custkey"),
        $"o_totalprice".cast("double").as("o_totalprice"), $"o_orderdate",
        concat(md5(concat($"o_orderkey".cast("string"), lit("a"))),
          md5(concat($"o_orderkey".cast("string"), lit("b"))),
          md5(concat($"o_orderkey".cast("string"), lit("c"))),
          md5(concat($"o_orderkey".cast("string"), lit("d")))).as("pad"))
    val s1 = t("seed")(SpecManifest.seed(spark, root, base, spec))
    val leaves96 = t("leafKeys")(SpecManifest.leafKeys(spark, root, spec).filter(_.head == "1996"))
    def perLeaf(df: org.apache.spark.sql.DataFrame): Map[Seq[String], org.apache.spark.sql.DataFrame] = {
      val tagged = spec.fields.foldLeft(df)((d, f) => d.withColumn(f.name, f.derived))
      tagged.select($"y", $"b").distinct().collect()
        .map(r => Seq(r.getString(0), r.getString(1)))
        .map(vs => vs -> tagged.filter($"y" === vs(0) && $"b" === vs(1)).drop("y", "b")).toMap
    }
    val up1 = t("perLeaf1")(perLeaf(base.filter(yearOf($"o_orderdate") === 1996 && $"o_orderkey" % 10 === 2)
      .withColumn("o_totalprice", $"o_totalprice" + 100.0)))
    t("commitMerge1")(SpecManifest.commitMerge(spark, root, spec, Seq("o_orderkey"), upserts = up1, keepSnapshots = 6))
    val del2 = t("perLeaf2")(perLeaf(base.filter(yearOf($"o_orderdate") === 1996 && $"o_orderkey" % 10 === 4))
      .map { case (vs, df) => vs -> df.select($"o_orderkey") })
    t("commitMerge2")(SpecManifest.commitMerge(spark, root, spec, Seq("o_orderkey"), deletes = del2, keepSnapshots = 6))
    val cur96 = t("readLeaves+ckpt")(leaves96.map { vs =>
      SpecManifest.readLeaf(spark, root, spec, vs).withColumn("_ly", lit(vs(0))).withColumn("_lb", lit(vs(1)))
    }.reduce(_.unionByName(_)).filter($"o_orderkey" % 20 === 2 || $"o_orderkey" % 90 === 2).localCheckpoint())
    val up3 = t("up3 build")(leaves96.flatMap { vs =>
      val cur = cur96.filter($"_ly" === vs(0) && $"_lb" === vs(1)).drop("_ly", "_lb")
      val u = cur.filter($"o_orderkey" % 20 === 2).withColumn("o_totalprice", $"o_totalprice" + 1000.0)
        .unionByName(cur.filter($"o_orderkey" % 90 === 2)
          .select(($"o_orderkey" + 1000000000L).as("o_orderkey"), $"o_custkey",
            lit(0.0).as("o_totalprice"), $"o_orderdate", $"pad"))
      if (u.isEmpty) None else Some(vs -> u)
    }.toMap)
    val s4 = t("commitMerge3")(SpecManifest.commitMerge(spark, root, spec, Seq("o_orderkey"), upserts = up3, keepSnapshots = 6))
    val ch = t("changesBetween plan")(SpecManifest.changesBetween(spark, root, spec, s1, s4))
    t("changes count")(ch.count())
    t("read final count")(SpecManifest.read(spark, root, spec).count())
    }
    spark.stop()
  }
}
