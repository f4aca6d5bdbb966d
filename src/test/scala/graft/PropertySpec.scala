package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style invariants over seeded random inputs (SURVEY.md §5.3).
  * Seeded Random keeps runs reproducible without extra test deps.
  */
class PropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rnd = new Random(42)
  private def randomRows(n: Int): Seq[(String, Int)] =
    Seq.fill(n)((rnd.alphanumeric.take(rnd.nextInt(4) + 1).mkString.toLowerCase, rnd.nextInt(100)))

  test("dedup: output keys unique, output subset of input, idempotent (20 random tables)") {
    (1 to 20).foreach { _ =>
      val rows = randomRows(rnd.nextInt(40) + 1)
      val df = rows.toDF("k", "v")
      val out = Relational.dedupKeepFirst(df, Seq("k"), Seq($"v", $"k")).collect()
      assert(out.length == rows.map(_._1).distinct.length)
      val inSet = rows.toSet
      assert(out.forall(r => inSet.contains((r.getString(0), r.getInt(1)))))
    }
  }

  test("union counts: count(a union b) = count(a) + count(b) before dedup") {
    val a = randomRows(25).toDF("k", "v")
    val b = randomRows(13).toDF("k", "v")
    assert(a.unionByName(b).count() == a.count() + b.count())
  }

  test("filter result is always a subset of input") {
    val df = randomRows(50).toDF("k", "v")
    val f = df.filter(Relational.containsCI($"k", "a"))
    assert(f.exceptAll(df).count() == 0)
  }

  test("normalize is idempotent on random unicode-ish strings") {
    val strs = Seq.fill(30)(rnd.nextString(12)).toDF("t")
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(lower(regexp_replace(c, "[^a-zA-Z0-9 ]", "")))
    val bad = strs.select(norm($"t").as("n1"))
      .select($"n1", norm($"n1").as("n2"))
      .filter($"n1" =!= $"n2")
    assert(bad.count() == 0)
  }

  test("chunking: coverage, count, and reconstruction hold for random token counts") {
    // For any doc of n tokens (n in 0..100, incl. empty and 1-token):
    // chunk count = ceil-by-stride, every chunk <= 20 tokens, the final
    // chunk ends at the last token, and stitching chunk starts (every 15
    // tokens) reconstructs the token stream.
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(101)
      (i.toLong, Seq.fill(n)(rnd.alphanumeric.take(3).mkString.toLowerCase).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = operators.Corpus.chunkTokens(df)
      .select("doc_id", "chunk_idx", "chunk", "n_tokens")
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val n = toks.length
      val cs = got.getOrElse(id, Array.empty).sortBy(_._2)
      if (n == 0) assert(cs.isEmpty, s"doc $id: empty doc must yield no chunks")
      else {
        assert(cs.length == (n - 1) / 15 + 1, s"doc $id: ${cs.length} chunks for $n tokens")
        assert(cs.forall(_._4 <= 20))
        val last = cs.last
        assert(last._2 * 15 + last._4 == n, s"doc $id: final chunk must clip at token $n")
        // reconstruction: the first 15 tokens of each chunk, then the tail
        val stitched = cs.flatMap(c => c._3.split(" ").take(15)).take(n) ++
          cs.last._3.split(" ").drop(15)
        assert(stitched.toSeq == toks.toSeq, s"doc $id: stitched stream diverges")
      }
    }
  }

  test("connected components match a union-find reference on 15 random graphs") {
    def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: every node in an edge → min id of its component
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
    }
    (1 to 15).foreach { trial =>
      val n = rnd.nextInt(50) + 10L
      val m = rnd.nextInt(80) + 1
      val edges = Seq.fill(m)((rnd.nextLong(n), rnd.nextLong(n)))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val got = operators.Components.connectedComponents(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        assert(got == unionFind(n, edges), s"trial $trial: $edges")
      }
    }
  }

  test("media codecs: WAV/BMP/PNG/JPEG/AVI round-trip over 30 seeded random inputs") {
    import graft.operators.MediaCodec
    (1 to 30).foreach { trial =>
      // WAV: arbitrary PCM16 samples round-trip sample-exact
      val sr = rnd.nextInt(48000) + 1
      val samples = Array.fill(rnd.nextInt(300) + 1)(rnd.nextInt(65536).toShort)
      val wav = MediaCodec.wavBytes(sr, samples)
      assert(MediaCodec.parseWav(wav) == MediaCodec.WavMeta(sr, 1, 16, samples.length), s"trial $trial")
      assert(MediaCodec.wavSamples(wav).toSeq == samples.toSeq, s"trial $trial")
      // BMP: any dims/gray parse back with the real stride-padded size
      val (bw, bh) = (rnd.nextInt(40) + 1, rnd.nextInt(30) + 1)
      val bmp = MediaCodec.bmpBytes(bw, bh, Array.fill(rnd.nextInt(64) + 1)(rnd.nextInt(256).toByte))
      val bm = MediaCodec.parseBmp(bmp)
      assert(bm.width == bw && bm.height == bh && bm.fileSize == bmp.length, s"trial $trial")
      // PNG: pixel-exact raster round trip; JPEG: dims/format survive the DCT
      val (pw, ph) = (rnd.nextInt(32) + 1, rnd.nextInt(24) + 1)
      val px = Array.fill(pw * ph)(rnd.nextInt(256))
      val (im, got) = MediaCodec.imagePixels(MediaCodec.grayImageBytes("png", pw, ph, px(_)))
      assert(im.format == "png" && im.width == pw && im.height == ph, s"trial $trial")
      assert(got.toSeq == px.toSeq, s"trial $trial: PNG raster must be lossless")
      val jm = MediaCodec.parseImage(MediaCodec.grayImageBytes("jpeg", pw, ph, px(_)))
      assert(jm.format == "jpeg" && jm.width == pw && jm.height == ph, s"trial $trial")
      // AVI: arbitrary frame payloads (odd lengths included) round-trip
      // byte-exact in order through the container walk
      val frames = Seq.fill(rnd.nextInt(6) + 1)(
        Array.fill(rnd.nextInt(50) + 1)(rnd.nextInt(256).toByte))
      val (am, fr) = MediaCodec.parseAvi(MediaCodec.aviBytes(pw, ph, frames))
      assert(am == MediaCodec.AviMeta(pw, ph, frames.length), s"trial $trial")
      assert(fr.map(_.toSeq) == frames.map(_.toSeq), s"trial $trial")
    }
  }
}
