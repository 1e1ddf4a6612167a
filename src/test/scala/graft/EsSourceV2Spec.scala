package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2.EsTableProvider

/** DataSourceV2 file-backed ES source: filter + projection pushdown reach
  * the custom scan, and results match the native parquet path on the s7
  * bool-query shape. */
class EsSourceV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val docs = "/root/testdata/sf0.001/documents.parquet"
  private val fmt = classOf[EsTableProvider].getName

  private def v2 = spark.read.format(fmt).load(docs)

  private def s7shape(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("lang") === "en" && col("n_chars") >= 100 &&
        col("n_chars") < 400 &&
        (col("text").contains("the row") || col("text").contains("spark")) &&
        !(col("source") === "src3"))
      .select("doc_id", "lang", "source", "n_chars")

  test("results match the native parquet path") {
    val native = s7shape(spark.read.parquet(docs))
    val got = s7shape(v2)
    assert(got.count() > 0)
    assert(got.exceptAll(native).isEmpty && native.exceptAll(got).isEmpty)
  }

  test("filters and projection are pushed into the custom scan") {
    val p = s7shape(v2).queryExecution.explainString(FormattedMode)
    assert(p.contains("EsFileScan pushed=["), p)
    assert(p.contains("EqualTo(lang,en)"), p)
    assert(p.contains("GreaterThanOrEqual(n_chars,100)"), p)
    assert(p.contains("StringContains(text,the row)"), p)
    // projection pushdown: the scan's read schema is the 4 output columns
    // (text is fetched only to evaluate the pushed phrase filter)
    assert(p.contains("read=struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>"), p)
  }

  test("schema inference reads the parquet footer") {
    assert(v2.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }
}
