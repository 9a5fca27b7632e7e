package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV source with the reference's load semantics
  * (`/root/reference/test/runtests.jl:11-18`): header row, ""/"NA"/"NaN"/
  * "NULL"/"Null" as missing, schema inference. The reference additionally
  * dictionary-encodes string columns (`pool=true`); in Spark that is parquet
  * dictionary encoding on disk + the distinct-value rewrite at plan level
  * (Gamma.addGammaColumnDistinct), not a type.
  */
object CsvFixtures {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nullValue", "NA")
      .option("emptyValue", "")
      .csv(path)
      // CSV's emptyValue handling keeps empty strings; the reference coerces
      // them to missing
      .transform { df =>
        df.schema.fields.foldLeft(df) { (acc, f) =>
          if (f.dataType.typeName == "string")
            acc.withColumn(f.name, when(col(f.name) === "", lit(null)).otherwise(col(f.name)))
          else acc
        }
      }

  /** Loads a test-resource CSV (e.g. the reference's dfA/dfB fixtures,
    * re-shipped at src/test/resources) with a deterministic 64-bit row id
    * appended — the analogue of `hash.(eachrow(df))`
    * (`/root/reference/test/runtests.jl:20-21`), except deterministic and
    * collision-checked by the caller's tests.
    */
  def readWithRowId(spark: SparkSession, path: String, idName: String): DataFrame = {
    val df = read(spark, path)
    df.withColumn(idName, xxhash64(df.columns.map(col): _*))
  }
}
