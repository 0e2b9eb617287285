package graft

import graft.expressions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native-expression correctness: graft_dot must agree exactly with the
  * interpreted HOF formulation (same sequential double accumulation).
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals HOF dot bit-for-bit on float arrays") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_dot works via SQL after registration, with nulls null-propagated") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
    val n = spark.sql("SELECT graft_dot(CAST(null AS array<double>), array(1.0D)) AS d")
      .select(isnull(col("d"))).as[Boolean].head()
    assert(n)
  }

  test("graft_dot rejects non-numeric-array inputs at analysis") {
    GraftFunctions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
  }
}
