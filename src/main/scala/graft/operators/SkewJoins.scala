package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for equi-joins. First resorts at 100 TB, in
  * order: (1) broadcast the small side — no shuffle, no skew; (2) AQE's
  * skew-join split (`spark.sql.adaptive.skewJoin.*`) — runtime, free. This
  * operator is for the cases those can't reach: both sides too large to
  * broadcast AND the skew concentrated in keys AQE won't split further
  * (its splitting is bounded by partition-size thresholds), or engines/
  * paths where AQE doesn't apply (e.g. feeding a streaming join).
  *
  * Mechanism (the standard salting construction): every row of the LARGE
  * side gets a uniform salt in [0, S); the other side is replicated S
  * times with each salt value; the join key becomes (key, salt), so one
  * hot key's rows spread over S shuffle partitions instead of one. The
  * salt changes WHERE rows meet, never WHICH rows meet — output equals
  * the unsalted join exactly (the spec and q47's oracle assert this).
  * Cost: the replicated side shuffles S× its size — pick S ≈ the ratio
  * hottest-key-rows / average-partition-rows, not "big to be safe".
  */
object SkewJoins {

  /** Inner equi-join with the LEFT side salted and the RIGHT side
    * replicated `salt` times. `rand(seed)` keeps runs reproducible in
    * distribution; results are salt-independent by construction.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, seed: Long = 42L): DataFrame = {
    require(salt > 1, s"salt must be > 1 (got $salt); use a plain join otherwise")
    val l = left.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
