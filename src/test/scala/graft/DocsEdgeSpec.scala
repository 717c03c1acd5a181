package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Degenerate-corpus robustness for the documents-based query families
  * (text_* / dedup_* / corpus_* / mm_*): every registered query must
  * execute cleanly over a corpus that mixes an EMPTY text, a single-token
  * doc, an exact-duplicate pair, and normal docs across two sources and
  * two languages — the document-side analog of EventsEdgeSpec. The
  * round-6 advisory class (zero-token divisors surfacing as engine
  * divergence) lives exactly here; a 100 TB crawl always contains empty
  * and one-word pages.
  */
class DocsEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** sf0.001 tables with documents REPLACED by the degenerate fixture. */
  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-edge").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "documents.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    val texts = Seq(
      // (doc_id, text, lang, source)
      (0L, "", "en", "srcA"), // empty text: zero tokens, zero chars
      (1L, "one", "en", "srcA"), // single token: no bigrams/shingles
      (2L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcA"),
      (3L, "the quick brown fox jumps over the lazy dog again and again", "en", "srcB"), // exact dup, other source
      (4L, "der schnelle braune fuchs springt und springt und springt weiter", "de", "srcB"),
      (5L, "a b a b a b a b a b a b a b a b", "en", "srcB")) // pure repetition
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    texts.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private val families = Seq("text_", "dedup_", "corpus_", "mm_")

  SparkEntry.queries.keys
    .filter(n => families.exists(n.startsWith)).toSeq.sorted.foreach { name =>
      test(s"$name executes over empty/one-token/exact-dup/repetition docs") {
        val df = SparkEntry.queries(name)(spark, edgeDir)
        assert(df.columns.nonEmpty)
        df.count() // force full execution — must not throw
      }
    }

  test("dedup_exact finds exactly the planted duplicate pair") {
    val groups = SparkEntry.queries("dedup_exact")(spark, edgeDir)
      .where(col("n") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n") == 2L)
    assert(groups.head.getAs[Long]("keeper") == 2L)
  }

  test("text_token_stats counts the empty doc as one single-empty-token row") {
    // split(trim('')) = [''] — the corpus contract both engines share
    val en = SparkEntry.queries("text_token_stats")(spark, edgeDir)
      .where(col("lang") === "en").collect().head
    assert(en.getAs[Long]("n_docs") == 5L)
  }

  test("corpus_dedup_savings attributes the dup copy to its own source") {
    val bySrc = SparkEntry.queries("corpus_dedup_savings")(spark, edgeDir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_dups"), r.getAs[Long]("bytes_saved"))).toMap
    // keeper is doc 2 (srcA); the non-keeper copy doc 3 sits in srcB
    assert(bySrc("srcA")._1 == 0L)
    assert(bySrc("srcB") == ((1L, 59L)))
  }
}
