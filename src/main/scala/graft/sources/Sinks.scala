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
      numFiles: Option[Int] = None, format: String = "parquet"): Unit = {
    val parted = numFiles match {
      case Some(n) => df.repartitionByRange(n, order: _*)
      case None => df.repartitionByRange(order: _*)
    }
    parted.sortWithinPartitions(order: _*)
      .write.mode("overwrite").format(format).save(out)
  }

  /** ORC twin of the ordered parquet landing — the other columnar lake
    * format Spark ships natively (no external jar): same disjoint
    * range-partitioned layout contract, same min/max row-group pruning
    * on read (ORC file/stripe statistics), same filter pushdown at the
    * scan. Exists so a consumer whose lake standardizes on ORC gets the
    * identical layout story (OrcRoundTripSpec proves byte-exact
    * round-trips incl. array<float> columns and a pushed scan filter). */
  def writeOrderedOrc(df: DataFrame, order: Seq[Column], out: String,
      numFiles: Option[Int] = None): Unit =
    writeOrdered(df, order, out, numFiles, format = "orc")

  /** K3 PNG sink (SURVEY §2.1, scrappy.py:519-526 — the wordcloud
    * `savefig`): render the A5 weighted-word aggregate (q77's bounded
    * output) into a REAL PNG artifact through the same headless
    * ImageIO encoder the multimodal family decodes with. The rendering
    * contract is deterministic and documented (ours, not a wordcloud
    * clone): input rows in (weight desc, word asc) order, one 8-px
    * horizontal band per word, filled to round(256·w/max) pixels at
    * intensity 224 − (band·13 mod 160) on a 16-gray background — so a
    * spec can re-parse the artifact (MediaCodec.parseImage) and check
    * dims AND the exact luma sum closed-form. Driver-side by design:
    * the input is a bounded top-K aggregate, exactly like the
    * reference's matplotlib figure; the DISTRIBUTED work is the A5
    * aggregation that feeds it. */
  def weightStripPng(rows: Seq[(String, Long)]): Array[Byte] = {
    require(rows.nonEmpty, "empty weight table")
    val w = 256; val bandH = 8
    val maxW = rows.map(_._2).max.toDouble
    require(maxW > 0, "all-zero weights")
    graft.operators.MediaCodec.grayImageBytes("png", w, rows.length * bandH, { i =>
      val x = i % w
      val band = (i / w) / bandH
      val fill = math.round(w * rows(band)._2 / maxW).toInt
      if (x < fill) 224 - (band * 13) % 160 else 16
    })
  }

  def writeWeightStripPng(rows: Seq[(String, Long)], out: String): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(out), weightStripPng(rows))
    ()
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
