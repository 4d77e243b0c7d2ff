package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-2 alternating least squares — the canonical distributed
  * matrix-factorization recommender (Koren/Bell/Volinsky 2009; the
  * Spark-MLlib flagship workload) re-expressed as pure DataFrame
  * algebra with an exact cross-engine arithmetic contract.
  *
  * Why rank 2: each half-step of ALS solves an independent ridge
  * regression per entity, `x_u = (YᵀY + λI)⁻¹ Yᵀr_u`, and at rank 2 the
  * 2×2 inverse is closed-form — so the WHOLE algorithm is expressible
  * as two joins + one groupBy per half-step with five integer
  * sufficient statistics per entity (a11, a12, a22, b1, b2), no linear
  * solver, no UDF, no driver loop over entities. The plan shape is
  * EXACTLY production distributed ALS: ratings shuffle-join the
  * current factor side on its key, partial-aggregate map-side into the
  * per-entity normal equations, and the closed-form solve is scalar
  * column arithmetic. At 100 TB the only state per entity is O(rank²)
  * and the factor tables are entity-cardinality-sized relations — AQE
  * picks broadcast vs shuffle per side; nothing is collected.
  *
  * Parity contract (the q236 k-means posture): factors live in exact
  * MILLI-units (longs). Each solve's sufficient statistics are exact
  * integer sums of milli-unit products (largest term y²·n_u ≤
  * 10¹⁰·n_u — far inside long for any plausible per-entity degree; the
  * per-entity degree is the SAME quantity a production ALS must bound
  * for its dense Yᵀr_u gather). The closed-form solve is evaluated in
  * doubles derived from those exact integers with an IDENTICAL operand
  * order on both engines — IEEE division/multiply on identical inputs
  * is identical — then re-quantized to milli-units and CLAMPED to
  * ±100.0 (a trust region: a near-singular normal matrix cannot emit
  * unbounded factors, and downstream integer arithmetic stays inside
  * long). λ strictly positive keeps det ≥ λ·(a11+a22) + λ² > 0
  * (Cauchy–Schwarz gives a12² ≤ a11·a22), so the solve never divides
  * by zero.
  */
object Factorization {

  /** Deterministic item-factor init in milli-units: two independent
    * affine-mod hashes of the item key spread y₀ uniformly over
    * [1.000, 2.000) — strictly positive, so the first user solve sees
    * a non-degenerate right-hand side. Mirrored literally by the
    * oracle SQL. */
  private def initY(i: Column): (Column, Column) = {
    val h1 = ((i.cast("long") % lit(TextOps.HashP)) * lit(1000003L)) %
      lit(TextOps.HashP) % 1000
    val h2 = ((i.cast("long") % lit(TextOps.HashP)) * lit(2654435761L)) %
      lit(TextOps.HashP) % 1000
    (lit(1000L) + h1, lit(1000L) + h2)
  }

  /** Stage `(u, i, r)` once per report: an alias-only projection over an
    * already-staged (LogicalRDD-rooted) input — what BOTH registered
    * callers pass, the [[StageCache]]'d quantity-ratings rollup — reads
    * the staged blocks in place, so re-checkpointing it here (the
    * pre-r17 shape) copied |ratings| rows per query per pass for
    * nothing. An input with a real plan behind it still pays the
    * checkpoint (it is read by every half-step and every eval). */
  private def stagedRatings(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    def rddRooted(p: LogicalPlan): Boolean = p match {
      case pr: Project => rddRooted(pr.child)
      case other => other.getClass.getSimpleName == "LogicalRDD"
    }
    if (rddRooted(df.queryExecution.optimizedPlan)) df
    else df.localCheckpoint()
  }

  /** The deterministic item-factor INIT relation — identical for the
    * explicit (q294) and implicit (q305) reports over the same ratings,
    * so it is [[StageCache]]-memoized on the ratings plan: the second
    * report (and warm passes) ride one staged distinct instead of
    * re-paying an |ratings|-scale distinct each. */
  private def initFactors(r: DataFrame): DataFrame =
    StageCache.getOrStage(StageCache.keyFor(r, "als-y0")) {
      val (y1, y2) = initY(col("i"))
      r.select(col("i")).distinct()
        .select(col("i"), y1.as("f1"), y2.as("f2"))
        .localCheckpoint()
    }

  /** One ridge half-step: solve `solveKey`'s factors from the fixed
    * `fixedKey` side. `ratings` columns: (solveKey, fixedKey, r);
    * `fixed` columns: (fixedKey, f1, f2) in milli-units. Returns
    * (solveKey, f1, f2) in milli-units, clamped to ±100000. */
  private def halfStep(ratings: DataFrame, fixed: DataFrame,
                       solveKey: String, fixedKey: String,
                       lambda: Double): DataFrame = {
    val stats = ratings
      .join(fixed.withColumnRenamed("f1", "y1").withColumnRenamed("f2", "y2"),
        Seq(fixedKey))
      .groupBy(solveKey)
      .agg(sum(col("y1") * col("y1")).as("a11"),
        sum(col("y1") * col("y2")).as("a12"),
        sum(col("y2") * col("y2")).as("a22"),
        sum(col("y1") * col("r")).as("b1"),
        sum(col("y2") * col("r")).as("b2"))
    val a11d = stats("a11").cast("double") / lit(1e6) + lit(lambda)
    val a22d = stats("a22").cast("double") / lit(1e6) + lit(lambda)
    val a12d = stats("a12").cast("double") / lit(1e6)
    val b1d = stats("b1").cast("double") / lit(1e3)
    val b2d = stats("b2").cast("double") / lit(1e3)
    val det = a11d * a22d - a12d * a12d
    def clampMilli(x: Column): Column =
      greatest(lit(-100000L),
        least(lit(100000L), round(x * 1000, 0).cast("long")))
    stats.select(col(solveKey),
      clampMilli((a22d * b1d - a12d * b2d) / det).as("f1"),
      clampMilli((a11d * b2d - a12d * b1d) / det).as("f2"))
  }

  /** Run `rounds` full ALS rounds (user solve then item solve each
    * round) over `ratings(user, item, r)` with integer ratings, and
    * score the TRAINING fit after every round: returns one row per
    * (round, segment) with the exact-integer RMSE of `pred = x·y`
    * against `r` in micro-units, plus the ratings volume. `segments`
    * maps each user to a report segment (user, segment).
    *
    * Reporting per round is the convergence certificate the house
    * applies to every iterative operator (q236/q280): the fit
    * trajectory is in the oracle-checked output, not asserted. */
  def alsRank2Report(ratings: DataFrame, userCol: String, itemCol: String,
                     segments: DataFrame, segCol: String,
                     rounds: Int = 2, lambda: Double = 0.1): DataFrame = {
    require(rounds >= 1 && rounds <= 4, s"rounds out of [1,4]: $rounds")
    // The no-divide-by-zero contract (det >= lambda*(a11+a22) + lambda^2
    // > 0, Cauchy-Schwarz) holds ONLY for strictly positive lambda; with
    // lambda <= 0 a rank-deficient entity would solve to NaN and the
    // clamp would silently convert it to a clamped factor.
    require(lambda > 0, s"lambda must be strictly positive, got $lambda")
    val r = stagedRatings(ratings.select(col(userCol).as("u"),
      col(itemCol).as("i"), col("r"))) // read by every half-step + eval
    var y = initFactors(r)
    val evals = (1 to rounds).map { rnd =>
      val x = halfStep(r, y, "u", "i", lambda).localCheckpoint()
      y = halfStep(r, x, "i", "u", lambda).localCheckpoint()
      // Training-fit eval for this round: pred and residual in exact
      // micro-units; squared residuals summed as DECIMAL(38,0) (a long
      // sum can wrap at corpus scale — the d² terms are ≤ ~2.5·10¹⁷).
      r.join(x.select(col("u"), col("f1").as("x1"), col("f2").as("x2")),
          Seq("u"))
        .join(y.select(col("i"), col("f1").as("y1"), col("f2").as("y2")),
          Seq("i"))
        .join(segments.select(col(userCol).as("u"),
          col(segCol).as("segment")), Seq("u"))
        .select(col("segment"),
          (col("x1") * col("y1") + col("x2") * col("y2") -
            col("r") * lit(1000000L)).as("d"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_ratings"),
          // cast BEFORE the multiply: a clamped-factor residual can
          // reach ~2·10¹⁰ micro, whose square exceeds long.
          sum(col("d").cast("decimal(19,0)") * col("d").cast("decimal(19,0)"))
            .as("sse"))
        .select(lit(rnd).cast("int").as("als_round"), col("segment"),
          col("n_ratings").cast("long").as("n_ratings"),
          // ONE shared sqrt over the same exact integers on both
          // engines (the q258 jackknife idiom), quantized to micro.
          round(sqrt(col("sse").cast("double") / col("n_ratings")), 0)
            .cast("long").as("rmse_micro"))
    }
    evals.reduce(_ unionAll _).orderBy("als_round", "segment")
  }

  /** One IMPLICIT-feedback ridge half-step (Hu–Koren–Volinsky, ICDM
    * 2008): solve `solveKey`'s factors against confidence-weighted
    * binary preferences. Observed (solveKey, fixedKey, r) pairs carry
    * preference p = 1 with confidence c = 1 + α·r; every UNOBSERVED
    * pair carries p = 0 with confidence 1 — the term that makes the
    * implicit form different, folded in closed form through the global
    * Gram G = Σ_all y·yᵀ (a broadcastable 2×2, the paper's YᵀY
    * precomputation) so no unobserved pair is ever materialized:
    *
    *   x = (G + Σ_obs α·r·y·yᵀ + λI)⁻¹ · Σ_obs (1 + α·r)·y
    *
    * Same exact-integer contract as [[halfStep]]: sufficient statistics
    * are exact integer sums (largest term α·r·y² ≤ α·r·10¹⁰ — bounded
    * by the same per-entity degree a production HKV gather bounds), the
    * closed-form solve runs in doubles over identical exact integers
    * with identical operand order, re-quantized and clamped ±100.0. */
  private def implicitHalfStep(ratings: DataFrame, fixed: DataFrame,
                               solveKey: String, fixedKey: String,
                               alpha: Long, lambda: Double): DataFrame = {
    val gram = fixed.agg(
      sum(col("f1") * col("f1")).as("g11"),
      sum(col("f1") * col("f2")).as("g12"),
      sum(col("f2") * col("f2")).as("g22"))
    val stats = ratings
      .join(fixed.withColumnRenamed("f1", "y1").withColumnRenamed("f2", "y2"),
        Seq(fixedKey))
      .groupBy(solveKey)
      .agg(sum(col("y1") * col("y1") * col("r") * lit(alpha)).as("a11"),
        sum(col("y1") * col("y2") * col("r") * lit(alpha)).as("a12"),
        sum(col("y2") * col("y2") * col("r") * lit(alpha)).as("a22"),
        sum((lit(1L) + lit(alpha) * col("r")) * col("y1")).as("b1"),
        sum((lit(1L) + lit(alpha) * col("r")) * col("y2")).as("b2"))
      .crossJoin(broadcast(gram)) // the one bounded scalar cross
    val m11 = (stats("g11") + stats("a11")).cast("double") / lit(1e6) +
      lit(lambda)
    val m22 = (stats("g22") + stats("a22")).cast("double") / lit(1e6) +
      lit(lambda)
    val m12 = (stats("g12") + stats("a12")).cast("double") / lit(1e6)
    val b1d = stats("b1").cast("double") / lit(1e3)
    val b2d = stats("b2").cast("double") / lit(1e3)
    val det = m11 * m22 - m12 * m12
    def clampMilli(x: Column): Column =
      greatest(lit(-100000L),
        least(lit(100000L), round(x * 1000, 0).cast("long")))
    stats.select(col(solveKey),
      clampMilli((m22 * b1d - m12 * b2d) / det).as("f1"),
      clampMilli((m11 * b2d - m12 * b1d) / det).as("f2"))
  }

  /** IMPLICIT-FEEDBACK rank-2 ALS training report (q305) — the
    * recommender production actually runs on purchase-like signals
    * (Hu–Koren–Volinsky 2008): `ratings(user, item, r)` holds POSITIVE
    * interaction counts (purchase quantities), never graded ratings, so
    * the model fits binary preference p=1 with confidence c = 1 + α·r
    * and every unobserved (user, item) pair counts as p=0 at confidence
    * 1. Each half-step folds the unobserved mass through the global
    * factor Gram (see [[implicitHalfStep]]) — the algebraic trick that
    * makes the algorithm O(observed) instead of O(users·items), i.e.
    * runnable at 100 TB at all.
    *
    * Per (round, segment) the report carries the two fit terms a
    * production implicit ALS monitors, both exact:
    *  - `wrmse_micro`: confidence-weighted RMSE over OBSERVED pairs
    *    (√(Σ c·(10⁶ − x·y)² / Σ c), micro-units) — does the model pull
    *    observed preferences toward 1?
    *  - `bg_micro`: the mean squared score over ALL (user, item) pairs
    *    of the segment (Σ_u xᵀGx / (n_users·n_items), micro) computed
    *    via the same Gram trick — does the unobserved mass stay pushed
    *    toward 0? (A model that inflates every score lowers wrmse while
    *    bg explodes; the pair is the honest readout.)
    *
    * Parity: factors exact milli; residuals exact micro, squared via
    * DECIMAL casts before multiply (a clamped residual's square exceeds
    * long); xᵀGx = Σ_i (x·y_i)² is an exact non-negative integer in
    * 10⁻¹² units (DECIMAL(38,0) — x²·G reaches ~10²⁴); one shared sqrt
    * per row over identical exact inputs, floor divisions elsewhere. */
  def alsImplicitReport(ratings: DataFrame, userCol: String, itemCol: String,
                        segments: DataFrame, segCol: String,
                        rounds: Int = 2, alpha: Long = 40L,
                        lambda: Double = 0.1): DataFrame = {
    require(rounds >= 1 && rounds <= 4, s"rounds out of [1,4]: $rounds")
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    require(lambda > 0, s"lambda must be strictly positive, got $lambda")
    val r = stagedRatings(ratings.select(col(userCol).as("u"),
      col(itemCol).as("i"), col("r"))) // read by every half-step + eval
    var y = initFactors(r)
    val evals = (1 to rounds).map { rnd =>
      val x = implicitHalfStep(r, y, "u", "i", alpha, lambda)
        .localCheckpoint()
      y = implicitHalfStep(r, x, "i", "u", alpha, lambda).localCheckpoint()
      // one factor-table pass serves the Gram AND the item count (y has
      // exactly one row per item) — no separate n_items scalar cross
      val gramY = y.agg(
        sum(col("f1") * col("f1")).as("g11"),
        sum(col("f1") * col("f2")).as("g12"),
        sum(col("f2") * col("f2")).as("g22"),
        count(lit(1)).as("n_items"))
      val seg = segments.select(col(userCol).as("u"),
        col(segCol).as("segment"))
      // observed-pair leg: d = 10^6 - x·y exact micro, weighted by c
      val obs = r
        .join(x.select(col("u"), col("f1").as("x1"), col("f2").as("x2")),
          Seq("u"))
        .join(y.select(col("i"), col("f1").as("y1"), col("f2").as("y2")),
          Seq("i"))
        .join(seg, Seq("u"))
        .select(col("segment"), (lit(1L) + lit(alpha) * col("r")).as("c"),
          (lit(1000000L) -
            (col("x1") * col("y1") + col("x2") * col("y2"))).as("d"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_ratings"),
          sum("c").as("c_sum"),
          sum(col("c") *
            (col("d").cast("decimal(19,0)") * col("d").cast("decimal(19,0)")))
            .as("wsse"))
      // background leg: per-user xᵀGx (exact, >= 0 — it is Σ_i (x·y_i)²),
      // segment mean per (user, item) pair in micro
      val bg = x.select(col("u"), col("f1").as("x1"), col("f2").as("x2"))
        .crossJoin(broadcast(gramY))
        .join(seg, Seq("u"))
        .select(col("segment"), col("n_items"),
          (col("x1").cast("decimal(19,0)") * col("x1").cast("decimal(19,0)") *
              col("g11") +
            lit(2).cast("decimal(19,0)") * col("x1").cast("decimal(19,0)") *
              col("x2").cast("decimal(19,0)") * col("g12") +
            col("x2").cast("decimal(19,0)") * col("x2").cast("decimal(19,0)") *
              col("g22")).as("xgx"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_users"), sum("xgx").as("xgx_sum"),
          max("n_items").as("n_items"))
      obs.join(bg, Seq("segment"))
        .select(lit(rnd).cast("int").as("als_round"), col("segment"),
          col("n_ratings").cast("long").as("n_ratings"),
          col("c_sum").cast("long").as("c_sum"),
          round(sqrt(col("wsse").cast("double") / col("c_sum")), 0)
            .cast("long").as("wrmse_micro"),
          expr("CAST(xgx_sum div (n_users * n_items * 1000000) AS BIGINT)")
            .as("bg_micro"))
    }
    evals.reduce(_ unionAll _).orderBy("als_round", "segment")
  }
}
