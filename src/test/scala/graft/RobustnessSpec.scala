package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ops-grade ingestion robustness: schema evolution across parquet
  * file generations, and scans that survive corrupt files instead of
  * failing the job — both everyday events on a 100 TB lake where
  * thousands of files arrive from different pipeline versions.
  */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeSchema unions parquet generations; old files read new columns as null") {
    val path = "target/tmp/robust_evolve"
    // generation 1: (id, v); generation 2 adds quality
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$path/gen=1")
    Seq((3L, 30.0, 0.9), (4L, 40.0, 0.7)).toDF("id", "v", "quality")
      .write.mode("overwrite").parquet(s"$path/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    assert(df.columns.toSet == Set("id", "v", "quality", "gen"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    // old-generation rows surface the evolved column as null
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("quality"))))
    assert(rows.drop(2).forall(!_.isNullAt(rows.head.fieldIndex("quality"))))
    // aggregation over the union ignores nulls, as a consumer expects
    val q = df.agg(avg("quality")).collect().head.getDouble(0)
    assert(math.abs(q - 0.8) < 1e-12)
  }

  test("ignoreCorruptFiles skips a truncated parquet instead of failing the scan") {
    val path = "target/tmp/robust_corrupt"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(path)
    // plant a corrupt file among the real ones
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-corrupt.parquet"),
      "PAR1 this is not a real parquet footer".getBytes)
    val strict = spark.read.parquet(path)
    intercept[Exception] { strict.count() }
    val lenient = spark.read.option("ignoreCorruptFiles", "true").parquet(path)
    assert(lenient.count() == 2)
    assert(lenient.orderBy("id").select("s").as[String].collect().toSeq == Seq("a", "b"))
  }
}
