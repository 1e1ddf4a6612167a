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

  test("limit pushdown reaches the scan and bounds reader output") {
    val df = v2.filter(col("lang") === "en").limit(7)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("limit=7"), p)
    assert(df.count() == 7)
  }

  test("terms-agg pushdown: grouped count/min/max run inside the reader") {
    val agg = v2.filter(col("lang") === "en")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), min("n_chars").as("lo"),
        max("n_chars").as("hi"))
    val p = agg.queryExecution.explainString(FormattedMode)
    assert(p.contains("group=[lang, source]"), p)
    assert(p.contains("aggs=[count_star(), min(n_chars), max(n_chars)]"), p)
    val native = spark.read.parquet(docs).filter(col("lang") === "en")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), min("n_chars").as("lo"),
        max("n_chars").as("hi"))
    val got = agg.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val want = native.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("distinct aggregates are NOT pushed — source declines them") {
    val agg = v2.groupBy("lang").agg(countDistinct("source").as("n"))
    val p = agg.queryExecution.explainString(FormattedMode)
    assert(!p.contains("aggs=["), p)
    assert(agg.collect().nonEmpty)
  }

  test("partitions are planned per row group, not per file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rg").toString
    spark.range(200000).select(col("id"),
        concat(lit("padpadpadpadpadpadpad"), col("id")).as("pad"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "65536") // tiny groups => many splits
      .parquet(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.rdd.getNumPartitions > 1,
      s"expected multiple row-group splits, got ${back.rdd.getNumPartitions}")
    // splitting must not duplicate or drop rows
    assert(back.count() == 200000)
    assert(back.agg(sum("id")).head().getLong(0) == 199999L * 200000 / 2)
  }
}
