package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one raw CSV reader behind every factory (generator frequency
  * tables, rule-mutator tables): all columns arrive as strings, NA
  * coercion is disabled (the reference reads with
  * keep_default_na=False — generator.py:157-158, mutator.py:566), and
  * header/delimiter/encoding are caller-controlled. Kept in one place
  * so the option set cannot drift between factories. */
object CsvIo {
  def read(spark: SparkSession, path: String, header: Boolean,
           delimiter: String, encoding: String): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("encoding", encoding)
      // nullValue set to a NUL escape no real cell contains, disabling
      // null coercion entirely
      .option("nullValue", "\u0000")
      .csv(path)
}
