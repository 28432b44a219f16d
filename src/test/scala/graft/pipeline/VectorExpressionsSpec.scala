package graft.pipeline

import graft.SparkTestBase
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class VectorExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("cosineC matches cosineJ and the Column form bit-for-bit") {
    val rnd = new Random(11)
    val rows = (1 to 50).map { i =>
      (i.toLong,
        Array.fill(17)(rnd.nextFloat() * 2 - 1),
        Array.fill(17)(rnd.nextFloat() * 2 - 1))
    } :+ ((51L, Array.fill(17)(0f), Array.fill(17)(1f)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select($"id",
      VectorExpressions.cosineC($"a", $"b").as("c_expr"),
      Similarity.cosine($"a", $"b").as("c_col"))
      .orderBy("id").collect()
    val kernel = rows.sortBy(_._1).map { case (_, a, b) =>
      Similarity.cosineJ(a, b)
    }
    out.zip(kernel).foreach { case (r, kc) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(kc),
        s"expr vs kernel at id ${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(kc),
        s"column vs kernel at id ${r.getLong(0)}")
    }
  }

  test("cosineC stays inside whole-stage codegen") {
    // non-foldable inputs so the optimizer cannot constant-fold the call
    val df = spark.range(10).select($"id",
      array($"id".cast("float"), lit(2f)).as("a"),
      array(lit(3f), lit(4f)).as("b"))
    val out = df.select(VectorExpressions.cosineC($"a", $"b").as("c"))
    val plan = out.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the scoring
    // projection must carry it (a CodegenFallback expression would not)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    // genCode must actually compile (no fallback): force evaluation
    assert(out.collect().length == 10)
    // and null inputs propagate
    val withNull = spark.range(2).select(
      when($"id" === 0, array(lit(1f))).as("a"), array(lit(1f)).as("b"))
    val r = withNull.select(
      VectorExpressions.cosineC($"a", $"b").as("c")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
