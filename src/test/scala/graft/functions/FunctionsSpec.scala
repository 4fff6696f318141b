package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the custom function surface: the codegen Expression
  * (vs the HOF twin and hand-computed values, plus null/edge cases)
  * and the Aggregator UDAF. */
class FunctionsSpec extends SparkSpec {
  import CosineSimilarity.cosine_sim

  test("cosine_sim matches hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).head.getDouble(0)
    val want = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosine_sim is bit-identical to the HOF formulation") {
    val e = graft.Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("embedding").as("a"))
      .crossJoin(e.select(col("embedding").as("b")))
    val n = pairs.select(
        cosine_sim(col("a"), col("b")).as("x"),
        TextSim.cosine(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y"))
      .count()
    assert(n == 0)
  }

  test("cosine_sim null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).head.isNullAt(0))
  }

  test("cosine_sim interpreted and codegen paths agree") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -1.5f, 3.25f), Array(-2.0f, 0.25f, 1.0f))).toDF("a", "b")
    val expr = CosineSimilarity(
      org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
      org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))
    val viaPlan = df.select(cosine_sim(col("a"), col("b"))).head.getDouble(0)
    // interpreted eval on the same input
    val row = df.select(col("a"), col("b")).queryExecution.toRdd.first()
    val interpreted = expr.nullSafeEval(row.getArray(0), row.getArray(1))
      .asInstanceOf[Double]
    assert(viaPlan == interpreted)
  }

  test("WeightedAvg aggregator: hand-checked groups and merge path") {
    import spark.implicits._
    val wavg = udaf(new WeightedAvg(),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble))
    // repartition(4) forces non-trivial partial-buffer merges
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "x", "w").repartition(4)
    val got = df.groupBy("k").agg(wavg(col("x"), col("w")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 70.0 / 4.0) < 1e-12)
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }
}
