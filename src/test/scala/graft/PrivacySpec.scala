package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** The DP release operator's three contracts: the noise is REAL (and
  * Laplace-scaled), the keyed PRF makes releases deterministic per
  * label, and the clamp bounds any single user's influence on a dpSum
  * by exactly the advertised sensitivity (the noise cancels between
  * neighboring datasets because the seed is the group key, which is
  * what lets the bound be asserted as an equality-free inequality with
  * zero tolerance). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val secret = "spec-secret"

  private def releases(label: String, eps: Double,
      sec: String = secret): Map[String, Double] = {
    val df = (1 to 1000).map(i => (s"g${i % 200}", i)).toDF("k", "v")
    Privacy.dpCount(df, Seq("k"), eps, sec, label)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("dpCount: same label replays identically; a new label redraws") {
    val a = releases("lbl_a", 1.0)
    val b = releases("lbl_a", 1.0)
    val c = releases("lbl_b", 1.0)
    assert(a == b, "same label must re-release the identical values")
    assert(a != c, "a fresh label must draw fresh noise")
  }

  test("dpCount noise depends on the deployment secret") {
    // the round-12 ADVICE attack: with no secret in the PRF, noise was
    // a pure function of (group key, label) — both public — so any
    // consumer could recompute and subtract it. With the secret mixed
    // in, a different key yields a completely different noise vector.
    val a = releases("lbl_s", 1.0)
    val b = releases("lbl_s", 1.0, sec = "attacker-guess")
    assert(a != b, "noise must not be reconstructable without the secret")
    assert(a.keySet == b.keySet)
  }

  test("dpCount noise is real and Laplace(1/eps)-scaled") {
    val eps = 1.0
    val exact = 1000 / 200 // 5 rows in every group
    val noise = releases("lbl_scale", eps).values.map(_ - exact).toSeq
    // no group should (at 2^-40 resolution) land exactly on its count
    assert(noise.count(_ == 0.0) == 0)
    // mean |Laplace(b)| = b = 1/eps; over 200 draws the sample mean of
    // |noise| concentrates well within [b/2, 2b]
    val meanAbs = noise.map(math.abs).sum / noise.size
    assert(meanAbs > 0.5 / eps && meanAbs < 2.0 / eps,
      s"mean |noise| $meanAbs vs scale ${1.0 / eps}")
    // and it is roughly centered: both signs present in quantity
    assert(noise.count(_ > 0) > 50 && noise.count(_ < 0) > 50)
  }

  test("dpSum: one user's influence is capped by the clamp (neighboring datasets)") {
    val clampCents = 10000L // $100
    def release(whaleCents: Long): Double = {
      val rows = (1 to 50).map(u => (s"u$u", "g", 100L)) :+
        (("whale", "g", whaleCents))
      val df = rows.toDF("user", "k", "cents")
      Privacy.dpSum(df, Seq("k"), "user", col("cents"),
          clampCents, eps = 1.0, secret, label = "whale")
        .collect().head.getDouble(1)
    }
    val base = release(0L)
    // the whale reports $10 000 000; the release moves by AT MOST the
    // $100 clamp (noise is seed-keyed on the group, so it cancels
    // exactly between the two neighboring datasets)
    val moved = release(1000000000L)
    assert(math.abs(moved - base) <= clampCents / 100.0 + 1e-6,
      s"influence ${moved - base} exceeds the clamp")
    // and the clamp binds in the right direction (the whale adds value)
    assert(moved > base)
  }

  test("epsilon ledger: spends add, replays are free, overdraw refuses BEFORE release") {
    val base = s"${graft.sources.Bucketing.processRoot}/dp_ledger_test"
    val df = (1 to 100).map(i => (s"g${i % 4}", i)).toDF("k", "v")
    def release(label: String, eps: Double) =
      Privacy.dpCountBudgeted(spark, df, Seq("k"), eps, secret, label, base,
        budget = 1.0).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1 = release("rel_a", 0.4)
    assert(Privacy.ledger(spark, base).map(_._2).sum == 0.4)
    // replay: identical release, nothing new spent
    assert(release("rel_a", 0.4) == r1)
    assert(Privacy.ledger(spark, base).map(_._2).sum == 0.4)
    // a replay must quote its original epsilon
    intercept[IllegalArgumentException] { release("rel_a", 0.5) }
    // second distinct release fits (0.4 + 0.5 <= 1.0)
    release("rel_b", 0.5)
    assert(Privacy.ledger(spark, base).map(_._2).sum == 0.9)
    // the overdrawing release refuses with NO data released
    val ex = intercept[IllegalStateException] { release("rel_c", 0.2) }
    assert(ex.getMessage.contains("overdraw"))
    assert(Privacy.ledger(spark, base).map(_._1).toSet ==
      Set("rel_a", "rel_b"), "a refused release must not be charged")
    // replays still work after a refusal
    assert(release("rel_a", 0.4) == r1)
  }

  test("dpSum clamps negative outliers symmetrically") {
    val clampCents = 5000L
    val rows = Seq(("a", "g", -900000L), ("b", "g", 2000L))
    val df = rows.toDF("user", "k", "cents")
    val rel = Privacy.dpSum(df, Seq("k"), "user", col("cents"),
        clampCents, eps = 1000.0, secret, label = "neg")
      .collect().head.getDouble(1)
    // eps=1000 ⇒ noise scale $0.05: the exact clamped sum is
    // −5000 + 2000 = −3000 cents = −$30; the release must sit within
    // a few noise scales of it, proving the negative clamp applied
    assert(math.abs(rel - (-30.0)) < 1.0, s"release $rel vs clamped −30")
  }

  test("dpSum contribution cap bounds a user across MANY groups") {
    // the round-12 ADVICE (low) gap: the clamp alone bounds each
    // per-(user, group) contribution, so a whale in k groups moved the
    // release VECTOR by k·clamp while ε accounted one. With
    // maxGroupsPerUser = 2, the whale keeps at most 2 hash-chosen
    // groups, so the L1 shift between neighboring datasets (with vs
    // without the whale) is ≤ 2·clamp — the noise is seed-keyed per
    // group and cancels exactly in the difference.
    val clampCents = 10000L // $100
    def release(withWhale: Boolean): Map[String, Double] = {
      val base = for (u <- 1 to 40; g <- Seq("g1", "g2", "g3", "g4", "g5"))
        yield (s"u$u", g, 100L)
      val rows = if (withWhale)
        base ++ Seq("g1", "g2", "g3", "g4", "g5").map(("whale", _, 999999L))
      else base
      Privacy.dpSum(rows.toDF("user", "k", "cents"), Seq("k"), "user",
          col("cents"), clampCents, eps = 1.0, secret,
          maxGroupsPerUser = 2, label = "cap")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    val a = release(withWhale = false)
    val b = release(withWhale = true)
    val l1 = a.keySet.map(k => math.abs(b(k) - a(k))).sum
    assert(l1 <= 2 * clampCents / 100.0 + 1e-6,
      s"whale moved the release vector by $$${l1}, past the 2-group cap")
    assert(l1 > 0, "the whale's kept contributions must register at all")
  }
}
