package graft.tools
import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashJoinProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Queries.docsWithNearDups(spark, "/root/testdata/sf0.1")
    def t[T](l: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    val scope = new CacheScope
    val blocks = 8; val bits = 8; val mask = (1L << bits) - 1
    val withSh = scope.persist(Dedup.simhashDfJ(docs, "doc_id", "text"))
    withSh.count()
    def partCol(q: Int) = shiftright(col("sh"), q * bits).bitwiseAND(mask)
    def exploded(flips: Boolean) = {
      val js = if (flips) -1 until bits else Seq(-1)
      val structs = for { q <- 0 until blocks; j <- js } yield {
        val p = partCol(q)
        if (j < 0) struct(lit(q).as("q"), p.as("part"), lit(true).as("ok"))
        else { val f = p.bitwiseOR(lit(1L << j))
          struct(lit(q).as("q"), f.as("part"), (f =!= p).as("ok")) }
      }
      withSh.select(col("id"), col("sh"), explode(array(structs: _*)).as("bb"))
        .filter(col("bb.ok"))
        .select(col("id"), col("sh"), col("bb.q"), col("bb.part"))
    }
    val exact = exploded(false)
    val oversized = exact.groupBy("q", "part").count()
      .filter(col("count") > 200).select("q", "part")
    val l = exact.join(broadcast(oversized), Seq("q","part"), "left_anti")
      .select(col("q"), col("part"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = exploded(true).join(broadcast(oversized), Seq("q","part"), "left_anti")
      .select(col("q"), col("part"), col("id").as("id_b"), col("sh").as("sh_b"))
    t("exact rows")(exact.count())
    t("probe rows")(exploded(true).count())
    t("raw join output")(l.join(r, Seq("q","part")).count())
    t("after id filter + hamming<=15")(
      l.join(r, Seq("q","part")).filter(col("id_a") =!= col("id_b"))
        .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 15).count())
    t("distinct pairs")(
      l.join(r, Seq("q","part")).filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("h"))
        .filter(col("h") <= 15).distinct().count())
    scope.close()
    spark.stop()
  }
}
