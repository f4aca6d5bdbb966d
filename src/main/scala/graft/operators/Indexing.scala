package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scalable global row indexing — assign every row a contiguous 0..n-1
  * index in a total key order WITHOUT the naive scale-killer:
  * `row_number() OVER (ORDER BY k)` plans as a Window with an EMPTY
  * partition spec, which funnels the entire table through one task (the
  * 100 TB equivalent of a driver collect). The reference has the same
  * need in miniature — pandas' implicit RangeIndex after sort
  * (article_querry.py's head(25) display relies on it).
  *
  * The scalable form is the classic two-pass:
  *   1. repartitionByRange(k) — parallel range exchange (sampled bounds),
  *      materialized ONCE with an eager localCheckpoint so both passes
  *      see identical partition boundaries (range bounds are sampled per
  *      execution; without pinning, pass 1's offsets could describe a
  *      different partitioning than pass 2 indexes — silently wrong ids).
  *   2. A #partitions-row histogram to the driver → exclusive prefix-sum
  *      offsets (control plane, like the keyword-tree frontier), then
  *      per-partition local row_number + broadcast offset join.
  *
  * Every Window in the final plan is partitioned (by _pid); nothing
  * single-partition survives — PlanShapeSpec pins this. Contrast with
  * `monotonically_increasing_id()`: parallel and cheap but NON-contiguous
  * (partition id in the high bits), so it can't serve as a stable
  * training-example ordinal or a join key against an external 0..n-1
  * numbering; this can.
  */
object Indexing {

  /** The shared two-pass core: inclusive running total of `value` in the
    * given total order, landed in `outCol`. Internal column names are
    * uniquified against the input (case-insensitively, matching Spark's
    * resolution) so a frame that already has a `_pid`/`_off`/`_val` is
    * never clobbered; `outCol` is part of the caller's contract and must
    * not exist on the input. NULL values count as 0 (a range partition
    * whose sum were NULL would otherwise NPE the driver-side offset
    * collect). */
  private def runningTotal(
      df: DataFrame, order: Seq[Column], value: Column, outCol: String): DataFrame =
    runningTotals(df, order, Seq(value -> outCol))

  /** Multi-value core: ONE range exchange + ONE #partitions-row offset
    * collect serves every (value, outCol) pair — a caller needing k
    * running sums in the same order (q248's cn+cs) pays one pass, not k. */
  private def runningTotals(
      df: DataFrame, order: Seq[Column], values: Seq[(Column, String)]): DataFrame = {
    def taken(n: String): Boolean = df.columns.exists(_.equalsIgnoreCase(n))
    values.foreach { case (_, outCol) =>
      require(!taken(outCol), s"adds a `$outCol` column; input already has one") }
    def fresh(base: String): String = {
      var n = base
      while (taken(n)) n += "_"
      n
    }
    val pidCol = fresh("_pid")
    val valCols = values.indices.map(i => fresh(s"_val$i"))
    val offCols = values.indices.map(i => fresh(s"_off$i"))
    val parted = values.zip(valCols)
      .foldLeft(df) { case (d, ((v, _), vc)) =>
        d.withColumn(vc, coalesce(v.cast("long"), lit(0L))) }
      .repartitionByRange(order: _*).localCheckpoint()
    val withPid = parted.withColumn(pidCol, spark_partition_id())
    val sums = withPid.groupBy(pidCol)
      .agg(valCols.map(vc => sum(col(vc)).as(vc)).head, valCols.map(vc => sum(col(vc)).as(vc)).tail: _*)
      .collect()
      .map(r => (r.getInt(0), valCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val offsets = sums.scanLeft((-1, valCols.indices.map(_ => 0L))) {
      case ((_, acc), (p, cs)) => (p, acc.zip(cs).map { case (a, c) => a + c })
    }.sliding(2).collect { case Array((_, off), (p, _)) => Row.fromSeq(p +: off) }.toSeq
    val spark = df.sparkSession
    val offSchema = StructType(
      StructField(pidCol, IntegerType, nullable = false) +:
        offCols.map(oc => StructField(oc, LongType, nullable = false)))
    val offDf = spark.createDataFrame(spark.sparkContext.parallelize(offsets, 1), offSchema)
    val w = Window.partitionBy(pidCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    values.indices
      .foldLeft(withPid.join(broadcast(offDf), pidCol)) { (d, i) =>
        d.withColumn(values(i)._2, col(offCols(i)) + sum(col(valCols(i))).over(w))
      }
      .drop(pidCol +: (valCols ++ offCols): _*)
  }

  /** (df, total key order, (value, outCol)*) → df + one INCLUSIVE global
    * running sum per pair, all in the same order, sharing a single range
    * exchange and offset pass. The scalable replacement for
    * `sum(x) OVER (ORDER BY k)` windows (q248's Lorenz prefix sums). */
  def globalPrefixSums(
      df: DataFrame, order: Seq[Column], values: Seq[(Column, String)]): DataFrame =
    runningTotals(df, order, values)

  /** (df, total key order) → df + contiguous `idx` 0..n-1 in that order:
    * the running count minus one. The order must be total (tie-free) for
    * the index to be deterministic — pass a unique key last. */
  def globalIndex(df: DataFrame, order: Seq[Column]): DataFrame =
    runningTotal(df, order, lit(1L), "idx")
      .withColumn("idx", col("idx") - 1L)

  /** (df, total key order, value) → df + `run`: the INCLUSIVE running sum
    * of `value` over the whole frame in that order — the primitive behind
    * token-budget selection (q103). `value` is summed as long, NULLs
    * counting as 0; the order must be total. */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column): DataFrame =
    runningTotal(df, order, value, "run")

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q56_global_index",
      // Contiguous global ordinal over documents in doc_id order. The
      // oracle is the naive single-partition window — same VALUES, the
      // difference is the distributed PLAN (asserted in PlanShapeSpec).
      (s, dir) =>
        globalIndex(Tables.documents(s, dir).select("doc_id", "n_chars"), Seq(col("doc_id")))
          .select(col("doc_id"), col("n_chars"), col("idx"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars,
             |row_number() OVER (ORDER BY doc_id) - 1 AS idx
             |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")))
  )
}
