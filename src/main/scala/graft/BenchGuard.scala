package graft

/** The bench's window-health DECISION logic, extracted pure so the
  * detector itself is spec-testable with planted scenarios.
  *
  * Why this exists: the r13 driver window shipped five contended
  * numbers unflagged (q_quality_clf ran 33.1/20.5/25.1 s against a
  * 2.0 s committed clean record) because co-tenant CPU pressure shows
  * up as NONE of the three r13 instruments — it is not hypervisor
  * steal, a 1-thread register spin still gets its core, and
  * between-query probe brackets miss contention that lands inside the
  * query window. The fourth trigger closes that blind spot: a query's
  * min wall reading more than [[FloorRatio]]x its COMMITTED clean
  * floor is suspicious regardless of what the probes saw, and earns a
  * settle + re-run + in-artifact flag. The flag means "inflated vs
  * the last committed clean record" — usually window dirt (the
  * settled re-run recovers), occasionally a real regression (the
  * re-run stays slow with clean probes); either way it must not ship
  * unflagged.
  */
object BenchGuard {

  /** A window is floor-dirty when min wall > FloorRatio x clean floor
    * AND the absolute excess clears FloorSlackSec — the slack keeps
    * sub-100ms queries from flapping on scheduler jitter. */
  val FloorRatio = 2.5
  val FloorSlackSec = 0.3

  /** Escalated floor ratio once the SESSION has already flagged
    * [[DirtySessionThreshold]] dirty windows: contention on this sandbox
    * is bursty and CORRELATED — when three windows have read dirty, the
    * prior that a 2x-inflated fourth is also contention (not noise) is
    * strong enough to flag at 1.8x. This is the r14 verdict's
    * detector-margin finding: q_iceberg_changelog shipped 2.13x its
    * committed floor UNFLAGGED in a window whose session had already
    * flagged several queries. */
  val FloorRatioEscalated = 1.8
  val DirtySessionThreshold = 3

  /** Committed per-query CLEAN floors at the sf0.1 tier: min wall over
    * the committed clean records (BASELINE_bench_r12_clean.json,
    * BASELINE_bench_r13_final.json, BASELINE_bench_r14_best/clean.json,
    * BASELINE_bench_r15_clean.json, BASELINE_bench_r16_clean.json,
    * BASELINE_bench_r17opt_w0-2.json (r17 contended-window minima on the
    * round-17-optimized code — same upper-bound argument as r16opt),
    * BASELINE_bench_r16opt_w1-5.json — the r16opt records are
    * best-of-CONTENDED-window walls on the round-16-optimized code: no
    * clean window occurred during that round's end; contention only
    * INFLATES a wall, so a minimum observed under dirt is a safe upper
    * bound on the clean floor and the floors only moved DOWN where the
    * optimized code beat the old floor despite the dirt). Maintained BY
    * HAND: when a query's implementation legitimately changes, update
    * its floor in the same commit (tools/bench_floors.py regenerates
    * both maps from the committed clean records). A query without an
    * entry (new gates, renamed keys) simply has no floor trigger. */
  val cleanFloorSf01: Map[String, Double] = Map(
    "q1_agg" -> 0.334,
    "q_ann_bruteforce" -> 0.224,
    "q_anti_join" -> 0.3,
    "q_asof_join" -> 0.26,
    "q_bm25" -> 0.437,
    "q_broadcast_join" -> 0.353,
    "q_dedup_minhash" -> 1.995,
    "q_dedup_simhash" -> 0.709,
    "q_delta_colmap_id" -> 0.057,
    "q_delta_dv" -> 0.126,
    "q_dfs_sql" -> 0.226,
    "q_dsir" -> 1.046,
    "q_dup_components" -> 2.263,
    "q_embed_neardup" -> 0.265,
    "q_except" -> 0.3,
    "q_iceberg_changelog" -> 0.547,
    "q_iceberg_eq_delete" -> 0.209,
    "q_iceberg_v2" -> 0.208,
    "q_lang_clf" -> 2.063,
    "q_multi_join" -> 0.808,
    "q_ngram_decontam" -> 0.683,
    "q_paimon_pk" -> 0.23,
    "q_quality_clf" -> 1.851,
    "q_range_join" -> 0.197,
    "q_sessionize" -> 0.311,
    "q_token_count" -> 0.219,
    "q_topn" -> 0.102,
    "q_window_running" -> 0.288)

  /** sf1 (10x corpus) tier floors, same provenance. */
  val cleanFloorSf1: Map[String, Double] = Map(
    "q_bm25" -> 0.674,
    "q_dedup_minhash" -> 4.836,
    "q_dedup_simhash" -> 0.944,
    "q_dsir" -> 2.389,
    "q_dup_components" -> 6.959,
    "q_iceberg_changelog" -> 0.518,
    "q_lang_clf" -> 3.237,
    "q_multi_join" -> 2.915,
    "q_quality_clf" -> 2.572)

  /** One query window's verdict: the list of tripped instruments
    * (empty = clean). Inputs are everything the bench measured for the
    * window, so the decision is a pure function of the artifact's own
    * fields:
    *  - "steal":     per-query hypervisor steal > 1%
    *  - "other_cpu": other-process CPU inside a rep above 15% of the
    *                 machine (walls >= 0.5 s only — below that, jiffy
    *                 quantization and ambient JVM burn dominate)
    *  - "bracket":   a parallel-calibration bracket > 1.5x the
    *                 session's clean floor
    *  - "floor":     min wall > [[FloorRatio]]x the committed clean
    *                 floor with > [[FloorSlackSec]] absolute excess —
    *                 the trigger that sees co-tenant pressure invisible
    *                 to all of the above. Once `sessionDirtyCount`
    *                 reaches [[DirtySessionThreshold]] the ratio drops
    *                 to [[FloorRatioEscalated]]: a session that has
    *                 already flagged three windows KNOWS the machine is
    *                 contended, so a 2x excursion is no longer
    *                 presumed-innocent.
    */
  def verdict(qStealPct: Double,
              wallsAndOtherCores: Seq[(Double, Double)],
              nCores: Int,
              bracket: Option[Double],
              floorPar: Double,
              minWall: Double,
              cleanFloor: Option[Double],
              sessionDirtyCount: Int = 0): Seq[String] = {
    val rs = Seq.newBuilder[String]
    if (qStealPct > 1.0) rs += "steal"
    if (wallsAndOtherCores.exists { case (w, oc) =>
        w > 0.5 && oc > 0.15 * nCores }) rs += "other_cpu"
    if (bracket.exists(_ > 1.5 * floorPar)) rs += "bracket"
    val ratio =
      if (sessionDirtyCount >= DirtySessionThreshold) FloorRatioEscalated
      else FloorRatio
    if (cleanFloor.exists(f =>
        minWall > ratio * f && minWall - f > FloorSlackSec))
      rs += "floor"
    rs.result()
  }
}
