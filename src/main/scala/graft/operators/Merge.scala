package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert/merge semantics over immutable DataFrames (SURVEY.md §2.9
  * M1–M10). The reference's `INSERT … ON CONFLICT DO UPDATE`
  * (database.py:255-290 and friends) becomes pure relational algebra:
  * the merged relation = updates ∪ (base ⟕anti updates). Writing it back
  * is the caller's job (overwrite the table / partition — M8's
  * delete-and-rebuild is a full overwrite of a derived table).
  *
  * Scale: the anti-join shuffles both sides by the business key once; with
  * the base table bucketed by key the shuffle disappears. One writer per
  * table (the reference serializes via Postgres row locks +
  * max_instances=1 — SURVEY §7.4.2).
  */
object Merge {

  /** MERGE: rows from `updates` win on key collision; unmatched base rows
    * pass through. Both frames must share the schema. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    updates.unionByName(base.join(updates.select(keys.map(col): _*), keys, "left_anti"))

  /** Insert-only-if-new (M10, weekly_scheduler.py:833-946): keep base
    * untouched, append only rows whose key is absent. */
  def insertIfAbsent(base: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    base.unionByName(incoming.join(base.select(keys.map(col): _*), keys, "left_anti"))

  /** [[upsert]] with SCHEMA EVOLUTION — the warehouse MERGE
    * `mergeSchema` semantics (reference migrations add columns to live
    * tables and backfill NULL, models.py defaults): `updates` may carry
    * columns `base` lacks (and vice versa); the result schema is the
    * union by name, with surviving base rows NULL-filled in the new
    * columns and update rows NULL-filled in any dropped ones. Updates
    * win on key collision, unmatched base rows survive — same algebra,
    * same single key shuffle. */
  def upsertEvolving(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"),
      allowMissingColumns = true)

  /** Keyed column update (M7, app.py:2077-2111): for each key present in
    * `updates`, replace the named columns; other columns and unmatched
    * rows unchanged. `updates` carries keys + the update columns. */
  def updateColumns(base: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    val u = updates.select((keys ++ updateCols).map(col): _*)
      .withColumnsRenamed(updateCols.map(c => c -> s"__u_$c").toMap)
    val joined = base.join(u, keys, "left_outer")
    val out = base.columns.map { c =>
      if (updateCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  /** Delete rows matching a predicate (M9, database.py:724-729,
    * 1137-1144): with immutable storage, delete = overwrite with the
    * complement. Caller writes the result back. */
  def deleteWhere(base: DataFrame, predicate: org.apache.spark.sql.Column): DataFrame =
    base.filter(!predicate || predicate.isNull)

  /** SCD type-2 merge — the audit-trail variant of upsert: instead of
    * overwriting a matched row, close its validity interval
    * (`valid_to` = the update's effective timestamp) and open a new
    * current row. History rows (`valid_to` set) pass through untouched;
    * an update whose attributes are null-safely identical to the open
    * row is a no-op; unseen keys insert as new current rows.
    *
    * `current` carries keys ++ attrs ++ (valid_from, valid_to);
    * `updates` carries keys ++ attrs ++ `effectiveCol`, pre-deduped to
    * one row per key (dedup a raw batch first, as in m6).
    *
    * Scale: one equi-join of open rows against the batch on the key —
    * updates batches are small next to the dimension, so Spark
    * broadcasts them; history rows are never read beyond the
    * valid_to-null partition filter (store partitioned on it). */
  def scd2(current: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], effectiveCol: String): DataFrame = {
    val history = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val u = updates.select(
      (keys.map(col) ++ attrs.map(a => col(a).as(s"__u_$a"))
        :+ col(effectiveCol).as("__eff")): _*)
    val joined = open.join(u, keys, "left_outer")
    val differs = attrs.map(a => !(col(a) <=> col(s"__u_$a"))).reduce(_ || _)
    val hit = col("__eff").isNotNull && differs
    val cols = current.columns.toSeq
    val closedNow = joined.filter(hit)
      .select(cols.map(c => if (c == "valid_to") col("__eff").as(c) else col(c)): _*)
    val openedNow = joined.filter(hit)
      .select(cols.map {
        case "valid_from" => col("__eff").as("valid_from")
        case "valid_to" => lit(null).cast(open.schema("valid_to").dataType).as("valid_to")
        case a if attrs.contains(a) => col(s"__u_$a").as(a)
        case c => col(c)
      }: _*)
    val untouched = joined.filter(!hit)
      .select(cols.map(col): _*)
    val fresh = u.join(open.select(keys.map(col): _*), keys, "left_anti")
      .select(cols.map {
        case "valid_from" => col("__eff").as("valid_from")
        case "valid_to" => lit(null).cast(open.schema("valid_to").dataType).as("valid_to")
        case a if attrs.contains(a) => col(s"__u_$a").as(a)
        case c => col(c)
      }: _*)
    history.unionByName(closedNow).unionByName(openedNow)
      .unionByName(untouched).unionByName(fresh)
  }

  /** Exactly-once-per-key ingest filter (T3/U3,
    * weekly_scheduler.py:586-609): drop incoming rows whose business key
    * already exists in the sink. */
  def newOnly(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Snapshot diff — the CDC view between two keyed table versions (the
    * reference's migration jobs answer "what changed since the last
    * sync" by re-reading both sides; reference migrate_data.py full-copy
    * + upsert flows). One full-outer join on the business key, then a
    * row-local verdict: `added` (key only in `newer`), `removed` (key
    * only in `older`), `changed` (any compared column differs,
    * null-safely). Unchanged rows are dropped — the diff IS the output.
    * Output carries old_/new_ pairs of every compared column.
    *
    * Scale: one key shuffle for each side, same as upsert; with both
    * snapshots bucketed by the key (sources.Bucketing) the exchange
    * disappears entirely — diffing two 100 TB snapshots then reads
    * co-located buckets with zero data movement. */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val o = older.select((keys ++ compare).map(col): _*)
      .withColumnsRenamed(compare.map(c => c -> s"old_$c").toMap)
      .withColumn("__in_old", lit(true))
    val n = newer.select((keys ++ compare).map(col): _*)
      .withColumnsRenamed(compare.map(c => c -> s"new_$c").toMap)
      .withColumn("__in_new", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val differs = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val verdict = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(differs, lit("changed"))
    joined
      .withColumn("change", verdict)
      .filter(col("change").isNotNull)
      .select((keys.map(col) :+ col("change")) ++
        compare.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
