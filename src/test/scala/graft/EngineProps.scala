package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Windows

/** ScalaCheck properties over the engine operators (SURVEY.md §5.3):
  * dedup idempotence, union-by-name alignment, surrogate-key density.
  * Sample count kept low — every sample runs real Spark jobs.
  */
object EngineProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rows: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))

  property("distinct is idempotent") = forAll(rows) { xs =>
    val df = xs.toDF("k", "v")
    df.distinct().count() == df.distinct().distinct().count()
  }

  property("unionByName(allowMissing) null-fills exactly the absent column") = forAll(rows) { xs =>
    val a = xs.toDF("k", "v")
    val b = xs.toDF("k", "v").withColumn("extra", lit(1))
    val u = a.unionByName(b, allowMissingColumns = true)
    u.count() == 2L * xs.size &&
      u.filter(col("extra").isNull).count() == xs.size
  }

  property("denseIdsScalable yields dense unique 1..N ids") = forAll(rows) { xs =>
    val df = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i) }.toDF("k", "v", "uniq")
    val ids = Windows.denseIdsScalable(df,
        Seq(col("k"), col("v"), col("uniq")), "sk")
      .select("sk").as[Long].collect().sorted.toSeq
    ids == (1L to xs.size.toLong)
  }
}
