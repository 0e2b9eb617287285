package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY build prompt: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join handles most cases at
  * runtime; explicit salting is the deterministic fallback when one
  * probe-side key dominates so heavily that even split shuffle blocks
  * overwhelm a task, or when AQE is unavailable (streaming joins).
  *
  * Mechanics: the skewed (probe) side gets a uniform salt in [0, S);
  * the build side is replicated S ways; the join key becomes
  * (key, salt). Scale: trades S× replication of the build side for an
  * S-way split of every hot key's shuffle block — pick S ≈ hottest-key
  * rows / target-partition rows.
  */
object SkewJoin {

  def saltedInner(probe: DataFrame, build: DataFrame, key: String,
                  salts: Int): DataFrame = {
    // salts=0 would make pmod(hash, 0) NULL on every probe row — a
    // silently EMPTY join, not an error
    require(salts > 0, s"saltedInner needs salts > 0 (got $salts)")
    // deterministic salt: stable under retries (hash of the whole probe
    // row modulo S would also work; positive pmod of a per-row hash)
    val salted = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop("__salt").drop(replicated(key))
  }
}
