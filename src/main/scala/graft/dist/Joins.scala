package graft.dist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side scale tooling: explicit skew handling.
  *
  * AQE's skew-join splitting handles moderate skew automatically (and stays
  * on in this engine's sessions); salting is the explicit tool for the case
  * AQE cannot fix — a SINGLE key so hot that one task cannot hold its rows.
  * The classic web-scale examples are the null/default key and boilerplate
  * join keys in training-data pipelines. */
object Joins {

  /** Salted equi-join: the skewed (big) side gets a uniform salt in
    * [0, salts); the small side is replicated once per salt value; the join
    * key becomes (key, salt), splitting each hot key across `salts` tasks.
    *
    * Output equals `big.join(small, keys, "inner")` exactly — the salt only
    * changes the partitioning, never the match set (every (key, salt)
    * combination of the big side finds the same small-side rows). Cost: the
    * small side shuffles `salts`× larger — size `salts` to the skew, not
    * higher. The salt is `rand(seed)`-derived: per-row, uniform, and needs
    * no semantic meaning because correctness never depends on its value. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 8, seed: Long = 42L): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedBig = big.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }
}
