package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Skew

/** Salted-aggregation equivalence and source-format round-trips. */
class SkewAndFormatsSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation (exact decimals)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val v = col("l_quantity").cast(DecimalType(12, 2))
    val direct = li.groupBy("l_returnflag")
      .agg(sum(v).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
      .sortBy(_._1)
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), v, 16)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
      .sortBy(_._1)
    assert(salted === direct)
  }

  test("csv and json round-trip the documents table") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang", "source", "n_chars") // text has no commas but keep it simple
    val base = Files.createTempDirectory("graft_fmt").toString

    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val fromCsv = spark.read.option("header", "true")
      .schema(docs.schema).csv(s"$base/csv")
    assert(fromCsv.count() === docs.count())
    assert(fromCsv.exceptAll(docs).count() === 0)

    docs.write.mode("overwrite").json(s"$base/json")
    val fromJson = spark.read.schema(docs.schema).json(s"$base/json")
    assert(fromJson.exceptAll(docs).count() === 0)
  }
}
