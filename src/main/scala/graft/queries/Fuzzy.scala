package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.FuzzyJoin

/** J6 — the fuzzy similarity join, staged on customer names: applicants
  * are noisy variants (exact / extra suffix / typo) of company names; the
  * join must recover the source row through the right scoring tier. */
object Fuzzy {

  private[queries] val SuffixReSql =
    """(?i)[\s.,]+(limited|ltd\.?|plc|llp|llc|l\.l\.c\.|inc\.?|incorporated|corp\.?|corporation|company|co\.?|group|holdings?|partners(hip)?|properties|developments?|construction|builders?|homes)\s*$"""

  private[queries] def normSql(x: String) =
    s"trim(regexp_replace(regexp_replace(lower($x), '[^a-z0-9''\\- ]', ' ', 'g'), ' +', ' ', 'g'))"
  private[queries] def stripSql(x: String) =
    s"regexp_replace(regexp_replace($x, '$SuffixReSql', ''), '$SuffixReSql', '')"

  val j6FuzzyJoin = Q(
    "j6_fuzzy_join",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val companies = cust.select(col("c_custkey").as("company_id"),
        col("c_name").as("company_name"))
      val applicants = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("applicant_id"),
          when(col("c_custkey") % 3 === 0,
            concat(regexp_replace(col("c_name"), "Customer", "Custmer"),
              lit(" Holdings Limited")))
            .when(col("c_custkey") % 3 === 1, concat(col("c_name"), lit(" LLP")))
            .otherwise(col("c_name")).as("applicant_name"))
      FuzzyJoin.matchNames(applicants, companies,
        "applicant_id", "applicant_name", "company_id", "company_name",
        minConfidence = 0.7, topK = 3, commonTokens = Seq("customer", "custmer"))
    },
    Some(s"""WITH companies AS (
        SELECT c_custkey AS company_id, c_name AS company_name,
          ${normSql("c_name")} AS c_norm,
          ${normSql(stripSql("c_name"))} AS c_base,
          regexp_extract(c_name, '([0-9]+)', 1) AS blk
        FROM customer),
      applicants AS (
        SELECT c_custkey AS applicant_id,
          CASE WHEN c_custkey % 3 = 0
                 THEN regexp_replace(c_name, 'Customer', 'Custmer') || ' Holdings Limited'
               WHEN c_custkey % 3 = 1 THEN c_name || ' LLP'
               ELSE c_name END AS applicant_name
        FROM customer WHERE c_custkey % 5 = 0),
      a2 AS (
        SELECT applicant_id, applicant_name,
          ${normSql("applicant_name")} AS a_norm,
          ${normSql(stripSql("applicant_name"))} AS a_base,
          regexp_extract(applicant_name, '([0-9]+)', 1) AS blk
        FROM applicants),
      scored AS (
        SELECT a.applicant_id, a.applicant_name, c.company_id, c.company_name,
          list_filter(list_distinct(string_split(a.a_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS at,
          list_filter(list_distinct(string_split(c.c_base, ' ')),
            t -> length(t) > 2 AND t NOT IN ('the', 'and', 'of')) AS ct,
          a.a_norm, a.a_base, c.c_norm, c.c_base
        FROM a2 a JOIN companies c ON a.blk = c.blk),
      tiers AS (
        SELECT applicant_id, applicant_name, company_id, company_name,
          least(CASE WHEN (len(list_intersect(at, ct)) = len(at)
                        OR len(list_intersect(at, ct)) = len(ct))
                       AND len(list_intersect(at, ct)) > 0
                     THEN CAST(len(list_intersect(at, ct)) AS DOUBLE)
                          / CAST(len(at) + len(ct) - len(list_intersect(at, ct)) AS DOUBLE) + 0.2
                     ELSE CASE WHEN len(at) + len(ct) - len(list_intersect(at, ct)) > 0
                               THEN CAST(len(list_intersect(at, ct)) AS DOUBLE)
                                    / CAST(len(at) + len(ct) - len(list_intersect(at, ct)) AS DOUBLE)
                               ELSE 0.0 END END, 1.0) AS token_sim,
          CASE WHEN greatest(length(a_base), length(c_base)) = 0 THEN 1.0
               ELSE 1.0 - CAST(levenshtein(a_base, c_base) AS DOUBLE)
                    / CAST(greatest(length(a_base), length(c_base)) AS DOUBLE) END AS fuzzy_sim,
          a_norm, a_base, c_norm, c_base
        FROM scored),
      m AS (
        SELECT applicant_id, applicant_name, company_id, company_name,
          CASE WHEN a_norm = c_norm THEN 'exact'
               WHEN a_base = c_base THEN 'suffix_normalized'
               WHEN token_sim >= 0.7 THEN 'token'
               WHEN fuzzy_sim >= 0.8 THEN 'fuzzy' END AS method,
          CASE WHEN a_norm = c_norm THEN 1.0
               WHEN a_base = c_base THEN 0.95
               WHEN token_sim >= 0.7 THEN token_sim
               WHEN fuzzy_sim >= 0.8 THEN fuzzy_sim END AS confidence
        FROM tiers)
      SELECT applicant_id, applicant_name, company_id, company_name, method,
        confidence, match_rank
      FROM (
        SELECT *, row_number() OVER (PARTITION BY applicant_id
          ORDER BY confidence DESC, company_id) AS match_rank
        FROM m WHERE confidence >= 0.7)
      WHERE match_rank <= 3"""))

  /** J19: FELLEGI–SUNTER record linkage (Fellegi & Sunter 1969) — the
    * probabilistic scoring j6's string tiers approximate by hand:
    * every blocked candidate pair gets a LOG-LIKELIHOOD match weight
    * Σ_field ln(m/u) (agree) / ln((1−m)/(1−u)) (disagree), where u —
    * the chance two RANDOM records agree on the field — is estimated
    * from the right file's value frequencies (u = Σ cnt²/N², exact
    * integers until one division) and m is the reviewer-set match
    * reliability. A frequency-rare field (the normalized name, unique)
    * earns a huge agreement weight; a 4-value segment earns little —
    * the whole point over j6's fixed tiers.
    *
    * Candidates are two LINEAR equi-join classes, no product anywhere:
    * the number-block join (the true-pair class, j6's blocking) and a
    * shifted decoy join (applicant i × company i+1 — deterministic
    * non-matches that exercise the disagreement weights). Applicant
    * fields carry deterministic perturbations (name typo %3, segment
    * %7, nation %11) so every agreement pattern occurs.
    *
    * Exactness: the six ln evaluations (3 fields × agree/disagree) run
    * on a ONE-ROW stats frame through the PortableLn chain, floor to
    * 1e-9 fixed point, and the per-pair weight is an exact INTEGER sum
    * of those six — broadcast 1-row product, integer adds, no float
    * accumulation across pairs. */
  val j19FsLinkage = Q(
    "j19_fs_linkage",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.DecimalType
      import graft.functions.{PortableLn, TextFunctions}
      def d(c: Column) = c.cast(DecimalType(38, 0))
      def base(c: Column) = TextFunctions.normalizeName(
        TextFunctions.removeCompanySuffixes(c))
      val cust = Tables.load(s, dir, "customer")
      val comp = cust.select(col("c_custkey").as("company_id"),
        base(col("c_name")).as("c_base"),
        col("c_mktsegment").as("c_seg"),
        col("c_nationkey").cast("long").as("c_nat"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("blk"))
      val app = cust.filter(col("c_custkey") % 5 === 0).select(
        col("c_custkey").as("applicant_id"),
        base(when(col("c_custkey") % 3 === 0,
          regexp_replace(col("c_name"), "Customer", "Custmer"))
          .otherwise(col("c_name"))).as("a_base"),
        when(col("c_custkey") % 7 === 0, lit("PERTURBED"))
          .otherwise(col("c_mktsegment")).as("a_seg"),
        when(col("c_custkey") % 11 === 0,
          (col("c_nationkey") + 1) % 25)
          .otherwise(col("c_nationkey")).cast("long").as("a_nat"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("blk"),
        (col("c_custkey") + 1).as("decoy_key"))
      val pairs = app.join(comp, Seq("blk"))
        .select(col("applicant_id"), col("company_id"),
          col("a_base"), col("c_base"), col("a_seg"), col("c_seg"),
          col("a_nat"), col("c_nat"))
        .unionByName(app.join(comp, app("decoy_key") === comp("company_id"))
          .select(col("applicant_id"), col("company_id"),
            col("a_base"), col("c_base"), col("a_seg"), col("c_seg"),
            col("a_nat"), col("c_nat")))
        .distinct()
      // u-probabilities from the right file's frequencies: ONE melted
      // pass computes all three Σcnt² (a string-cast melt keeps the
      // distinct structure), instead of a Spark job per field — the
      // query's cost was job count, not data (3.6 → ~1 s at sf0.1)
      val melted = comp.select(explode(map(
          lit("name"), col("c_base"),
          lit("seg"), col("c_seg"),
          lit("nat"), col("c_nat").cast("string"))).as(Seq("fld", "value")))
      val ssRow = melted.groupBy("fld", "value")
        .agg(count(lit(1)).as("c"))
        .groupBy("fld").agg(sum(d(col("c")) * d(col("c"))).as("ss"))
        .agg(max(when(col("fld") === "name", col("ss"))).as("ss_name"),
          max(when(col("fld") === "seg", col("ss"))).as("ss_seg"),
          max(when(col("fld") === "nat", col("ss"))).as("ss_nat"))
      var stats = comp.agg(count(lit(1)).as("nc")).crossJoin(ssRow)
      val ms = Seq("name" -> 0.95, "seg" -> 0.9, "nat" -> 0.9)
      for ((f, m) <- ms) {
        stats = stats
          .withColumn(s"u_$f", expr(
            s"CAST(ss_$f AS DOUBLE) / (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE))"))
          .withColumn(s"xa_$f", expr(s"${PortableLn.dbl(m)} / u_$f"))
          .withColumn(s"xd_$f", expr(
            s"${PortableLn.dbl(1.0 - m)} / (1.0e0 - u_$f)"))
        stats = PortableLn.withLn(
          PortableLn.withLn(stats, s"xa_$f", s"lna_$f"), s"xd_$f", s"lnd_$f")
        stats = stats
          .withColumn(s"a9_$f",
            expr(s"CAST(floor(lna_$f * 1.0e9) AS BIGINT)"))
          .withColumn(s"d9_$f",
            expr(s"CAST(floor(lnd_$f * 1.0e9) AS BIGINT)"))
      }
      val w = pairs.crossJoin(broadcast(
        stats.select(ms.map(_._1).flatMap(f =>
          Seq(col(s"a9_$f"), col(s"d9_$f"))): _*)))
        .withColumn("ag_name", col("a_base") === col("c_base"))
        .withColumn("ag_seg", col("a_seg") === col("c_seg"))
        .withColumn("ag_nat", col("a_nat") === col("c_nat"))
      w.select(col("applicant_id"), col("company_id"),
          concat(
            when(col("ag_name"), "1").otherwise("0"),
            when(col("ag_seg"), "1").otherwise("0"),
            when(col("ag_nat"), "1").otherwise("0")).as("pattern"),
          (when(col("ag_name"), col("a9_name")).otherwise(col("d9_name")) +
            when(col("ag_seg"), col("a9_seg")).otherwise(col("d9_seg")) +
            when(col("ag_nat"), col("a9_nat")).otherwise(col("d9_nat")))
            .as("weight9"))
        .orderBy("applicant_id", "company_id")
    },
    Some {
      import graft.functions.PortableLn
      val ms = Seq("name" -> 0.95, "seg" -> 0.9, "nat" -> 0.9)
      val uDefs = ms.map { case (f, m) =>
        s"""CAST(ss_$f AS DOUBLE) / (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE)) AS u_$f"""
      }.mkString(",\n          ")
      val xDefs = ms.map { case (f, m) =>
        s"""${PortableLn.dbl(m)} / u_$f AS xa_$f,
          ${PortableLn.dbl(1.0 - m)} / (1.0e0 - u_$f) AS xd_$f"""
      }.mkString(",\n          ")
      val chains = ms.flatMap { case (f, _) => Seq(s"xa_$f" -> s"lna_$f",
        s"xd_$f" -> s"lnd_$f") }
      val chainSql = chains.zipWithIndex.map { case ((x, out), i) =>
        val from = if (i == 0) "x0" else PortableLn.cteChainOut(s"ch$i")
        PortableLn.cteChainSql(from, x, out, s"ch${i + 1}")
      }.mkString(",\n      ")
      val lastChain = PortableLn.cteChainOut(s"ch${chains.length}")
      val w9Defs = ms.map { case (f, _) =>
        s"CAST(floor(lna_$f * 1.0e9) AS BIGINT) AS a9_$f, " +
          s"CAST(floor(lnd_$f * 1.0e9) AS BIGINT) AS d9_$f"
      }.mkString(",\n          ")
      s"""WITH comp AS (
        SELECT c_custkey AS company_id,
          ${normSql(stripSql("c_name"))} AS c_base,
          c_mktsegment AS c_seg, CAST(c_nationkey AS BIGINT) AS c_nat,
          regexp_extract(c_name, '([0-9]+)', 1) AS blk
        FROM customer),
      app AS (
        SELECT c_custkey AS applicant_id,
          ${normSql(stripSql(
            "(CASE WHEN c_custkey % 3 = 0 THEN regexp_replace(c_name, 'Customer', 'Custmer') ELSE c_name END)"))} AS a_base,
          CASE WHEN c_custkey % 7 = 0 THEN 'PERTURBED'
               ELSE c_mktsegment END AS a_seg,
          CAST(CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS BIGINT) AS a_nat,
          regexp_extract(c_name, '([0-9]+)', 1) AS blk,
          c_custkey + 1 AS decoy_key
        FROM customer WHERE c_custkey % 5 = 0),
      pairs AS (
        SELECT DISTINCT applicant_id, company_id, a_base, c_base,
          a_seg, c_seg, a_nat, c_nat
        FROM (
          SELECT applicant_id, company_id, a_base, c_base, a_seg, c_seg,
            a_nat, c_nat
          FROM app JOIN comp USING (blk)
          UNION ALL
          SELECT applicant_id, company_id, a_base, c_base, a_seg, c_seg,
            a_nat, c_nat
          FROM app JOIN comp ON app.decoy_key = comp.company_id)),
      s_name AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
        AS ss_name FROM (SELECT count(*) AS c FROM comp GROUP BY c_base)),
      s_seg AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
        AS ss_seg FROM (SELECT count(*) AS c FROM comp GROUP BY c_seg)),
      s_nat AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
        AS ss_nat FROM (SELECT count(*) AS c FROM comp GROUP BY c_nat)),
      n0 AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM comp),
      u0 AS (
        SELECT *,
          $uDefs
        FROM n0 CROSS JOIN s_name CROSS JOIN s_seg CROSS JOIN s_nat),
      x0 AS (
        SELECT *,
          $xDefs
        FROM u0),
      $chainSql,
      stats AS (
        SELECT
          $w9Defs
        FROM $lastChain)
      SELECT applicant_id, company_id,
        (CASE WHEN a_base = c_base THEN '1' ELSE '0' END)
          || (CASE WHEN a_seg = c_seg THEN '1' ELSE '0' END)
          || (CASE WHEN a_nat = c_nat THEN '1' ELSE '0' END) AS pattern,
        ((CASE WHEN a_base = c_base THEN a9_name ELSE d9_name END)
          + (CASE WHEN a_seg = c_seg THEN a9_seg ELSE d9_seg END)
          + (CASE WHEN a_nat = c_nat THEN a9_nat ELSE d9_nat END))
          AS weight9
      FROM pairs CROSS JOIN stats
      ORDER BY applicant_id, company_id"""
    })

  val all: Seq[Q] = Seq(j6FuzzyJoin, j19FsLinkage)
}
