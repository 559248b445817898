package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native DotProduct matches the HOF aggregate(zip_with) fold exactly") {
    // real float vectors, all pairs within a small id range — any
    // fold-order or promotion difference would break the bit equality
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") < 60)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val both = pairs.select(
      Similarity.dot(col("ea"), col("eb")).as("native"),
      Similarity.dotHof(col("ea"), col("eb")).as("hof"))
    assert(both.count() > 1000)
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("native DotProduct against a constant double array (mixed element types)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val plane = Similarity.planeCoefs(4, 64)(2)
    val planeArr = array(plane.map(lit(_)): _*)
    val both = emb.select(
      Similarity.dot(col("embedding"), planeArr).as("native"),
      Similarity.dotHof(col("embedding"), planeArr).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("null semantics replicate zip_with padding: null array, null element, ragged") {
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),   // plain
      (2L, null, Array(3f, 4f)),            // null array
      (3L, Array(1f, 2f, 5f), Array(3f, 4f)) // ragged: zip_with pads -> null
    ).toDF("id", "a", "b")
      // null ELEMENT case needs a nullable-element array: build via when()
      .withColumn("a2", when(col("id") === 1, col("a"))
        .otherwise(array(lit(null).cast("float"), lit(2f))))
    val both = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"),
      Similarity.dot(col("a2"), col("b")).as("native_ne"),
      Similarity.dotHof(col("a2"), col("b")).as("hof_ne"))
      .collect().sortBy(_.getLong(0))
    both.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"null-array parity broke: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) === r.getDouble(2))
      assert(r.isNullAt(3) === r.isNullAt(4), s"null-element parity broke: $r")
      if (!r.isNullAt(3)) assert(r.getDouble(3) === r.getDouble(4))
    }
    // the interesting rows actually ARE null on both sides
    assert(both.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(both.find(_.getLong(0) == 3L).get.isNullAt(1))
  }
}
