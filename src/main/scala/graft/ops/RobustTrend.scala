package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Index-arithmetic Theil–Sen pair sampling — the O(samples)
  * robust-trend core shared by the `theil_sen_sampled` query and the
  * ScaleSmoke span stage (ONE definition, so the scale evidence
  * measures exactly the pipeline the DuckDB oracle pins; see the
  * query's docstring in StatQueries for the estimator rationale).
  *
  * Input: an hourly census `(event_type, t, c)`. Per group, `draws`
  * h32-derived rank pairs pick endpoints directly (no n² generation);
  * two equi-joins against the rank-indexed census fetch the values.
  * Output: `(event_type, s, slope)` — slope 6-dp-rounded, `s` the
  * draw index (the deterministic tie-breaker downstream ranking
  * uses).
  */
object RobustTrend {

  def sampledSlopes(i: DataFrame, draws: Int): DataFrame = {
    val r = i.withColumn("rk",
      row_number().over(Window.partitionBy("event_type").orderBy("t")) - 1)
    val nb = i.groupBy("event_type").agg(count(lit(1)).cast("long").as("nb"))
    val pairs = nb
      .select(col("event_type"), col("nb"),
        explode(sequence(lit(0), lit(draws - 1))).as("s"))
      .select(col("event_type"), col("s"),
        (PortableHash.h32(concat(col("event_type"), lit("|"),
          col("s").cast("string"))) % col("nb")).as("ia"),
        (PortableHash.h32(concat(col("event_type"), lit("#"),
          col("s").cast("string"))) % col("nb")).as("ib"))
      .filter(col("ia") =!= col("ib"))
      .select(col("event_type"), col("s"),
        least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"))
    val a = r.select(col("event_type").as("eta"), col("rk").as("rka"),
      col("t").as("t1"), col("c").as("c1"))
    val b = r.select(col("event_type").as("etb"), col("rk").as("rkb"),
      col("t").as("t2"), col("c").as("c2"))
    pairs
      .join(broadcast(a), col("event_type") === col("eta") && col("lo") === col("rka"))
      .join(broadcast(b), col("event_type") === col("etb") && col("hi") === col("rkb"))
      .select(col("event_type"), col("s"),
        round((col("c2") - col("c1")).cast("double")
          / ((col("t2") - col("t1")) * 100.0), 6).as("slope"))
  }
}
