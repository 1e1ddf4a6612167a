package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PortableLn

/** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis 2006
  * ("Weighted random sampling with a reservoir"): every item draws
  * u ~ U(0,1) and the k items with the LARGEST u^(1/w) are a weighted
  * sample without replacement. This is the primitive behind auditable
  * training-data mixtures ("sample 1M docs ∝ length/quality"): unlike
  * Bernoulli thinning (txt_sample's hash-mod), it hits the requested k
  * exactly and respects per-item weights.
  *
  * Two substitutions make it engine-portable and reproducible:
  *
  *  - `u` is DETERMINISTIC: (hash56(id)+1)/(2^56+1) ∈ (0,1). The same
  *    item always draws the same u on any engine, run, or partitioning
  *    — the sample is a pure function of ids and weights, so a re-run
  *    audits cleanly and adding items never reshuffles survivors'
  *    draws (same property txt_split relies on).
  *  - items rank by ln(u)/w, monotone-equivalent to u^(1/w) (exp is
  *    monotone), with the ln evaluated through [[PortableLn]] — IEEE
  *    +,−,×,÷ only, so Spark and DuckDB produce the SAME 64 ranking
  *    bits and the oracle can replay selection exactly.
  *
  * Domain note: u < 2^-53 (i.e. hash56 < 7 — probability ~2^-53) lands
  * in PortableLn's clamped region: still deterministic on both engines,
  * just a degraded ln for an item whose key is bottom-of-the-ocean
  * anyway.
  *
  * Scale shape: key computation is per-row narrow work; selection is
  * the partial TopK aggregator over one global group — map-side
  * combine caps every partition's contribution at k, so the shuffle
  * carries partitions×k rows, never the corpus. Weight ≤ 0 rows are
  * excluded (E-S requires w > 0).
  */
object Sampling {

  /** u = (h+1)/(2^56+1) as shared SQL text — the identical fragment
    * goes through Spark's `expr` and the DuckDB oracle. */
  def uSql(h: String): String =
    s"(CAST($h + 1 AS DOUBLE) / CAST(${Dedup.M56} + 1 AS DOUBLE))"

  /** key = ln(u)/w (w as DOUBLE; exact-rounded division). */
  def keySql(lnu: String, w: String): String =
    s"($lnu / CAST($w AS DOUBLE))"

  /** The k-item weighted sample: (rank, id, weight-as-double), rank 1 =
    * largest key. `idCol` must be castable to string (hash input) and
    * LONG (TopK id slot), and ids must be UNIQUE: u is a pure function
    * of the id, so duplicate ids share one draw — they are the same
    * item to E-S, not independent entries (the determinism that makes
    * the sample auditable is exactly what forbids multiset ids). The
    * weight rides through the aggregation in the TopK payload slot, so
    * the sampled rows need no re-attach join — one corpus scan total,
    * and the weight emitted is bit-for-bit the weight that ranked the
    * row. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val keyed = keyedFrame(df, idCol, weightCol)
    val topk = TopK.topKW(k)
    keyed
      .groupBy()
      .agg(topk(col("es_key"), col(idCol).cast("long"),
        col(weightCol).cast("double")).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.w").as(weightCol))
  }

  /** STRATIFIED weighted sampling: exact k per stratum (per language,
    * per source, per quality band) — the mixture-construction primitive
    * behind fixed-ratio training mixes ("50k docs per language, long
    * docs proportionally harder"). Same E-S keys as [[weightedSample]];
    * the only change is the groupBy, so map-side combine caps the
    * shuffle at partitions × strata × k and a hot stratum never owns a
    * task (the TopK skew property). Output: (stratum, rank, id, weight),
    * rank 1..k within each stratum. */
  def weightedSampleStratified(df: DataFrame, strataCol: String,
      idCol: String, weightCol: String, k: Int): DataFrame = {
    val keyed = keyedFrame(df, idCol, weightCol)
    val topk = TopK.topKW(k)
    keyed
      .groupBy(col(strataCol))
      .agg(topk(col("es_key"), col(idCol).cast("long"),
        col(weightCol).cast("double")).as("top"))
      .select(col(strataCol), posexplode(col("top")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.w").as(weightCol))
  }

  /** Shared key computation: w>0 filter, deterministic u, portable ln,
    * key = ln(u)/w. Per-row narrow work — no shuffle. */
  private def keyedFrame(df: DataFrame, idCol: String,
      weightCol: String): DataFrame = {
    val base = df
      .filter(col(weightCol) > 0)
      .withColumn("es_h", Dedup.hash56(col(idCol).cast("string")))
      .withColumn("es_u", expr(uSql("es_h")))
    PortableLn.withLn(base, "es_u", "es_lnu")
      .withColumn("es_key", expr(keySql("es_lnu", weightCol)))
  }

  /** The oracle: same u, same PortableLn chain, same key, ranked by a
    * window (oracle-side scale is not a concern). `strataCol` adds the
    * PARTITION BY for the stratified twin. */
  def weightedSampleOracleSql(table: String, idCol: String,
      weightCol: String, k: Int, strataCol: Option[String] = None): String = {
    val h = s"((md5_number_lower(CAST($idCol AS VARCHAR)) % ${Dedup.M56})::BIGINT)"
    val strata = strataCol.map(c => s"$c, ").getOrElse("")
    val partition = strataCol.map(c => s"PARTITION BY $c ").getOrElse("")
    s"""WITH es0 AS (
        SELECT $strata$idCol, $weightCol, ${uSql(h)} AS es_u
        FROM $table WHERE $weightCol > 0),
      ${PortableLn.cteChainSql("es0", "es_u", "es_lnu", "esln")},
      esk AS (
        SELECT $strata$idCol, $weightCol,
          ${keySql("es_lnu", weightCol)} AS es_key
        FROM ${PortableLn.cteChainOut("esln")})
      SELECT $strata CAST(rn AS BIGINT) AS rank, $idCol,
        CAST($weightCol AS DOUBLE) AS $weightCol
      FROM (SELECT *, row_number()
              OVER ($partition ORDER BY es_key DESC, $idCol) AS rn
            FROM esk)
      WHERE rn <= $k"""
  }
}
