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
    val r = ratings.select(col(userCol).as("u"), col(itemCol).as("i"),
      col("r")).localCheckpoint() // read by every half-step + every eval
    val (y1, y2) = initY(col("i"))
    var y = r.select(col("i")).distinct()
      .select(col("i"), y1.as("f1"), y2.as("f2"))
      .localCheckpoint()
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
}
