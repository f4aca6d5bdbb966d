package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Output-layout writers (SURVEY.md §2.1 K1/K2 extended): at 100 TB the
  * SHAPE of what lands on disk — file count, per-file ordering, partition
  * directories, file sizes — matters as much as the bytes, because it
  * decides what the next reader can prune and whether downstream merges
  * need a shuffle. The reference's to_csv (scrappy.py:337) has no layout
  * story; these are the Spark-native ones.
  */
object Sinks {

  /** Globally ordered parquet: range-repartition on the sort key, sort
    * within partitions, write. Files are mutually disjoint key ranges,
    * each internally sorted — a global total order ACROSS files without
    * ever funneling data through one task (orderBy(...).coalesce(1) is
    * the single-writer scale-killer this replaces). Readers get
    * min/max-pruned row groups for free from parquet statistics. */
  def writeOrdered(df: DataFrame, order: Seq[Column], out: String,
      numFiles: Option[Int] = None): Unit = {
    val parted = numFiles match {
      case Some(n) => df.repartitionByRange(n, order: _*)
      case None => df.repartitionByRange(order: _*)
    }
    parted.sortWithinPartitions(order: _*).write.mode("overwrite").parquet(out)
  }

  /** Hive-style partitioned layout (partition column → directory), with a
    * per-file row cap so one giant partition value cannot produce one
    * giant file. Readers filtering on the partition column scan only its
    * directories (PartitionFilters — pinned in SinksSpec). */
  def writeHivePartitioned(df: DataFrame, partCols: Seq[String], out: String,
      maxRecordsPerFile: Long = 0L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(out)
}
