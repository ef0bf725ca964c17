package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.App

/** CSV/JSON source+sink round-trips through the app model (Milan
  * `CsvDataInputFormat`/`JsonDataInputFormat` capability — explicit schema,
  * header/separator/null options ride Spark's DataSource options). */
class IoFormatSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", DoubleType)))

  test("csv with header, separator and null identifier round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq(("a", Some(1.5)), ("b", None), ("c", Some(2.0)))
      .toDF("k", "v")
      .write.option("header", "true").option("sep", ";").option("nullValue", "NULL")
      .csv(s"$dir/in")

    val running = App.run(spark, new App.Config()
      .setSource("in", App.Source("csv", Some(s"$dir/in"),
        Map("header" -> "true", "sep" -> ";", "nullValue" -> "NULL"), Some(schema)))
      .addSink("out", App.Sink("json", Some(s"$dir/out")))) { input =>
      Map("out" -> input("in").where(col("v").isNotNull))
    }
    assert(running.nonEmpty)
    val back = spark.read.schema(schema).json(s"$dir/out")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(back == Set(("a", 1.5), ("c", 2.0)), "null row filtered, rest round-tripped via JSON")
  }
}
