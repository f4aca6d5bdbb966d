package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join. A hot key that would land one
  * monster partition on the shuffle is scattered across `salts`
  * sub-partitions; the (small) build side is replicated once per salt.
  * Output is provably identical to the plain join — the salt only changes
  * data placement. AQE's skew-join handles the moderate cases at runtime;
  * explicit salting is for the pathological keys known in advance.
  */
object Salting {

  /** probe ⋈ build on `key`, scattering probe rows over `salts` buckets.
    * `build` should be the small side (it is replicated `salts`×). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    // rand is fine here: the salt value never affects the join RESULT,
    // only which sub-partition a row lands in.
    val p = probe.withColumn("__salt", (rand(42) * salts).cast("int"))
    val b = build.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q85_salted_join",
      // l_returnflag has 3 distinct values over 60k rows — the canonical
      // skewed key. Salted 8 ways; the oracle is the plain join (identical
      // result by construction).
      (s, dir) => {
        val dim = Tables.lineitem(s, dir).select(col("l_returnflag")).distinct()
          .withColumn("flag_label", concat(lit("flag_"), col("l_returnflag")))
        saltedJoin(Tables.lineitem(s, dir), dim, "l_returnflag", salts = 8)
          .groupBy("l_returnflag", "flag_label")
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, 'flag_' || l_returnflag AS flag_label,
             |count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag""".stripMargin.replace("\n", " ")))
  )
}
