package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** The native DotScaled expression must be value-identical to the HOF
  * reference formulation (aggregate ∘ zip_with) in BOTH execution modes —
  * whole-stage codegen (doGenCode) and interpreted (nullSafeEval) — since
  * every cosine the engine emits, and therefore every oracle hash, is
  * built from it.
  */
class VectorExprsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * y.cast("double") * lit(1e14)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  test("DotScaled == HOF reference on the real embeddings (codegen path)") {
    val e = Tables.embeddings(spark, sfTiny)
    val diff = e.select(
        VectorExprs.dotScaled(col("embedding"), col("embedding")).as("native"),
        hofDot(col("embedding"), col("embedding")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(diff == 0)
  }

  test("DotScaled == HOF reference in interpreted mode") {
    val e = Tables.embeddings(spark, sfTiny)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val diff = e.select(
          VectorExprs.dotScaled(col("embedding"), col("embedding")).as("native"),
          hofDot(col("embedding"), col("embedding")).as("ref"))
        .filter(col("native") =!= col("ref"))
        .count()
      assert(diff == 0)
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("DotScaled handles nulls and asymmetric use") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f, 1.0f))),
      (Some(Seq(0.5f, -0.5f)), None))
      .toDF("a", "b")
    val got = df.select(VectorExprs.dotScaled(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) ==
      math.floor(3.0 * 1e14).toLong + math.floor(8.0 * 1e14).toLong)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("SortedIntersectCount matches size(array_intersect) on random sorted sets") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(42)
    def randSet(): Seq[Long] =
      Seq.fill(rnd.nextInt(50))(rnd.nextInt(60).toLong).distinct.sorted
    val rows = Seq.fill(500)((randSet(), randSet()))
    // explicit containsNull=false schemas: the expression's declared
    // contract (and what sort_array(collect_list(...)) produces); the
    // Scala encoder's default containsNull=true is rejected at analysis
    def df(data: Seq[(Seq[Any], Seq[Any])], et: DataType) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(r => Row(r._1, r._2))),
        StructType(Seq(
          StructField("a", ArrayType(et, containsNull = false)),
          StructField("b", ArrayType(et, containsNull = false)))))
    val diff = df(rows, LongType).select(
        VectorExprs.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(diff == 0)
    // string variant with the same comparator sort_array uses
    val srows = rows.map { case (a, b) =>
      (a.map(x => f"g$x%03d").sorted: Seq[Any],
        b.map(x => f"g$x%03d").sorted: Seq[Any])
    }
    val sdiff = df(srows, StringType).select(
        VectorExprs.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(sdiff == 0)
  }

  test("SortedIntersectCount rejects mismatched and nullable-element inputs") {
    import spark.implicits._
    val df = Seq((Seq(1L), Seq("a"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExprs.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    // containsNull=true (the encoder default for non-primitive elements)
    // must be an ANALYSIS error: the merge loop would read garbage bytes
    // from a null slot
    val nullable = Seq((Seq("a"), Seq("b"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(VectorExprs.sortedIntersectCount(col("a"), col("b"))).collect()
    }
  }
}
