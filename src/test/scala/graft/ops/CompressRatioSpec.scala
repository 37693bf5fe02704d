package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_compress_ratio is rows-only at the DuckDB oracle (no DEFLATE
  * there), so THIS spec carries the semantics: a direct-JVM
  * differential, the discriminative property the signal exists for,
  * and the edge contract. */
class CompressRatioSpec extends SparkSpec {
  import spark.implicits._

  private def deflateLenJvm(s: String): Long = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  // high-entropy text: an md5 chain (no repeated 32-char block)
  private def noisy(n: Int): String =
    Iterator.iterate(md5hex("seed"))(md5hex).take(n).mkString(" ")

  test("expression == a fresh JVM Deflater on every fixture doc (differential)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val got = TextOps.compressionRatio(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("n_deflate"))).toMap
    val raw = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    assert(raw.nonEmpty)
    raw.foreach { case (id, text) =>
      assert(got(id) === (text.getBytes("UTF-8").length.toLong, deflateLenJvm(text)),
        s"doc $id drifted from the direct Deflater")
    }
  }

  test("the signal discriminates: repetition sinks, entropy floats") {
    val docs = Seq(
      (1L, "lorem ipsum " * 500),     // pathological repetition
      (2L, noisy(400)),               // high entropy
      (3L, ""),                       // empty: null ratio, 0 bytes
      (4L, "tiny")
    ).toDF("doc_id", "text")
    val r = TextOps.compressionRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bytes"), Option(x.get(x.fieldIndex("ratio")))
          .map(_.asInstanceOf[Double]))).toMap
    assert(r(1L)._2.get < 0.05, s"repetition should crush: ${r(1L)}")
    assert(r(2L)._2.get > 0.5, s"md5 chain should resist: ${r(2L)}")
    assert(r(2L)._2.get > 5 * r(1L)._2.get, "no separation between junk and prose")
    assert(r(3L) === ((0L, None)), "empty doc must carry a NULL ratio, not 0/0")
    assert(r(4L)._2.isDefined && r(4L)._1 === 4L)
  }

  test("doubling a document compresses BETTER than the document (window reuse)") {
    val base = noisy(100) // ~3.3KB, well inside zlib's 32KB window
    val docs = Seq((1L, base), (2L, base + " " + base)).toDF("doc_id", "text")
    val r = TextOps.compressionRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("ratio")).toMap
    assert(r(2L) < r(1L) * 0.7,
      s"the second copy should nearly vanish: base=${r(1L)} doubled=${r(2L)}")
  }
}
