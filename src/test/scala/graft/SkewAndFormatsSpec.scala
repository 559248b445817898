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

  test("a hot key with a CONSTANT value spreads across salt buckets") {
    // the motivating skew scenario: one heavy-hitter key whose value is
    // a constant (value=1 counters). A content-derived salt
    // (hash(value) % buckets — the round-2 implementation) maps every
    // such row to ONE bucket, silently disabling the mitigation; the
    // position-derived salt must occupy (nearly) all of them.
    import spark.implicits._
    val hot = Seq.fill(10000)(("hot", 1.0)).toDF("k", "v").repartition(4)
    val buckets = Skew.saltedPartials(hot, Seq("k"), col("v"), 16)
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(buckets >= 2, s"hot key collapsed to $buckets salt bucket(s)")
    assert(buckets === 16, s"expected full occupancy for 10k rows, got $buckets")
  }

  test("salted join equals plain join (inner and left_outer), hot key spreads") {
    import spark.implicits._
    // hot key 1 dominates the big side; key 3 has no match (left_outer)
    val big = (Seq.fill(5000)((1L, "a")) ++ Seq((2L, "b"), (3L, "c")))
      .toDF("k", "payload").repartition(4)
    val dim = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4")).toDF("k", "d")
    for (jt <- Seq("inner", "left_outer")) {
      val salted = Skew.saltedJoin(big, dim, "k", 8, jt)
        .groupBy("k", "d").count()
      val plain = big.join(dim, Seq("k"), jt).groupBy("k", "d").count()
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted $jt join diverged from plain join")
    }
    // the hot key's rows really do land in multiple salt buckets
    val occupied = big.filter(col("k") === 1L)
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(occupied === 8, s"hot key occupied $occupied of 8 buckets")
  }

  test("AQE splits the hot-key join unaided; declines when a same-key agg follows (salting's niche)") {
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> conf.get(k))
    try {
      // shrink AQE's skew thresholds so the fixture-scale hot key is
      // "oversized" the way a 100 TB hot key would be at defaults
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 3 of 4 rows land on key 1, with a fat payload
      def big = spark.range(40000).select(
        when(col("id") % 4 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      def dim = spark.range(40000).select(col("id").as("k"),
        md5(col("id").cast("string")).as("d"))
      // (1) bare join: AQE's OptimizeSkewedJoin splits the hot
      // partition at runtime — no manual salting needed
      val joined = big.join(dim, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
      // (2) the same join feeding a same-key aggregate: splitting the
      // hot partition would force an extra shuffle before the agg, so
      // AQE *currently* declines — that gap is saltedJoin's niche. The
      // decline is an AQE cost-model heuristic, not a product contract,
      // so it is LOGGED (a Spark upgrade may legitimately flip it);
      // what we assert is correctness of the result either way.
      val agged = big.join(dim, "k").groupBy("k").count()
      val got = agged.collect()
      val aggPlan = agged.queryExecution.executedPlan.toString
      info(s"AQE skew split under same-key agg applied: ${aggPlan.contains("skew=true")}")
      // 30000 of 40000 big-side ids collapse onto k=1 (id % 4 != 0),
      // each matching exactly one dim row; the rest keep their own id
      assert(got.length === 10001)
      assert(got.find(_.getLong(0) == 1L).map(_.getLong(1)).contains(30000L),
        "hot-key group count wrong under the skew-tuned AQE config")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
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

    // ORC is the other built-in columnar format (spark-avro connector
    // is not shipped in this environment)
    docs.write.mode("overwrite").orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(fromOrc.exceptAll(docs).count() === 0)
  }
}

class TopKAggSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TopKAgg

  test("bounded top-k equals window row_number <= k under any partitioning") {
    val rows = Seq(
      ("a", 5.0, 1L, 1L), ("a", 9.0, 2L, 1L), ("a", 9.0, 1L, 2L),
      ("a", 9.0, 1L, 1L), ("a", 7.0, 3L, 1L), ("b", 1.0, 9L, 9L))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "v", "t1", "t2").repartition(parts)
      val got = df.groupBy("g")
        .agg(TopKAgg(col("v"), col("t1"), col("t2"), 3).as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), (col("pos") + 1).as("rn"),
          col("col.value"), col("col.tie1"), col("col.tie2"))
        .as[(String, Int, Double, Long, Long)].collect().sorted
      // value DESC, ties ASC; k=3 caps group a; group b keeps its 1 row
      assert(got === Array(
        ("a", 1, 9.0, 1L, 1L), ("a", 2, 9.0, 1L, 2L), ("a", 3, 9.0, 2L, 1L),
        ("b", 1, 1.0, 9L, 9L)).sorted, s"parts=$parts")
    }
  }

  test("null inputs are skipped, empty group yields empty array") {
    val df = Seq(
      ("a", Some(2.0), 1L), ("a", None, 2L), ("b", None, 3L)
    ).toDF("g", "v", "t")
    val got = df.groupBy("g")
      .agg(TopKAgg(col("v"), col("t"), col("t"), 2).as("tk"))
      .select(col("g"), size(col("tk")).as("n"))
      .as[(String, Int)].collect().sorted
    assert(got === Array(("a", 1), ("b", 0)))
  }
}

class CmsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.functions.CountMinSketchAgg

  test("count-min sketch: estimate >= true count, exact without collisions") {
    import spark.implicits._
    val D = 4; val W = 64
    val items = (Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq("c")).map(Tuple1(_))
    val sk = items.toDF("item")
      .agg(CountMinSketchAgg(col("item"), D, W).as("sk"))
    def est(p: String) = sk.select(
      least((0 until D).map(r =>
        element_at(col("sk"), r * W + CountMinSketchAgg.bucket(r, p, W) + 1)): _*))
      .as[Long].head()
    // CMS guarantee: never undercounts
    assert(est("a") >= 10 && est("b") >= 3 && est("c") >= 1)
    // 3 distinct items in 64 buckets: no collision in at least one of
    // 4 rows with overwhelming probability -> estimates exact here
    assert(est("a") === 10)
    assert(est("b") === 3)
    assert(est("c") === 1)
  }

  test("count-min sketch: merge associativity across partitionings") {
    import spark.implicits._
    val D = 2; val W = 32
    val data = (1 to 500).map(i => Tuple1((i % 17).toString))
    val one = data.toDF("item").coalesce(1)
      .agg(CountMinSketchAgg(col("item"), D, W)).as[Seq[Long]].head()
    val many = data.toDF("item").repartition(13)
      .agg(CountMinSketchAgg(col("item"), D, W)).as[Seq[Long]].head()
    assert(one === many)
  }

  test("count-min inner product estimates join size within the AMS bound") {
    import spark.implicits._
    val D = 4; val W = 256
    // the real fixture: how many (click, purchase) same-user pairs
    // would a user_id join produce?
    val ev = Tables.load(spark, sf001, "events")
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id").cast("string").as("k"))
    def sketch(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(CountMinSketchAgg(col("k"), D, W)).as[Seq[Long]].head().toArray
    val (a, b) = (sketch(side("click")), sketch(side("purchase")))
    val est = CountMinSketchAgg.innerProduct(a, b, D, W)
    val exact = side("click").join(side("purchase"), "k").count()
    val (na, nb) = (side("click").count(), side("purchase").count())
    // CMS guarantee: never under; over by at most (e/W)·N_a·N_b w.h.p.
    assert(est >= exact, s"inner product undercounts: $est < $exact")
    assert(est <= exact + (math.E / W * na * nb).toLong,
      s"inner product blew the AMS bound: $est vs $exact (N=$na,$nb)")
  }
}
