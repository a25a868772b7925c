package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Corpus mixture control — deterministic stratified downsampling to
  * target per-stratum rates (the "data mixing" step that rebalances
  * languages/sources/domains before training).
  *
  * The keep decision is a pure hash of the row id (`polyhash(id) mod
  * 10000 < rate_bp`), NOT an RNG draw: every executor, retry, and
  * re-run makes the same decision with no seed plumbing or sampler
  * state, the sampled fraction concentrates tightly around rate_bp/1e4,
  * and the decision is replayable by any engine (oracle-verified).
  * A pure projection + filter — no shuffle; at 100 TB this samples
  * in the scan stage, upstream of everything else.
  */
object Mixing {

  /** Keep each row of stratum `s` with probability `ratesBp(s)/10000`
    * (basis points), `defaultBp` for unlisted strata.
    *
    * The raw rolling polyhash of a SHORT key (e.g. a numeric id) lands
    * in a narrow value band, so `% 10000` alone is visibly biased
    * (measured 57% kept at a 40% target on 3-digit ids); the LCG
    * finalizer `(h*1103515245 + 12345) mod 2^31` avalanches the band
    * across the ring before the rate compare — same constants as the
    * LSH projections, replayable in plain SQL. */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      ratesBp: Map[String, Int], defaultBp: Int = 10000): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate: Column = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val h = GraftFunctions.polyhash(col(idCol).cast("string"))
    val mixed = (h * 1103515245L + 12345L) % 2147483648L % 10000L
    df.filter(mixed < rate)
  }
}
