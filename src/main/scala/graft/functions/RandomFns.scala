package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-distribution column functions (SURVEY.md §2.7 F8–F10).
  *
  * The reference samples with Python `random` (turnstile_hardware.py:66,
  * weather.py:57-65); here each distribution is pure column math over
  * `rand(seed)` — composition of built-ins (SURVEY §7.3: preferred over a
  * custom Expression when semantics allow), deterministic per seed and fully
  * codegen'd. No oracle SQL: RNG streams differ by engine; specs pin the
  * distributions statistically and the determinism exactly.
  */
object RandomFns {

  /** F8 — uniform integer in [lo, hi) like `random.choice(range(lo, hi))`
    * (turnstile_hardware.py:66's U[-5,4]).
    */
  def uniformInt(seed: Long, lo: Int, hi: Int): Column =
    (floor(rand(seed) * (hi - lo)) + lo).cast("int")

  /** F9 — triangular(a, b, mode) via inverse-CDF over one uniform draw
    * (weather.py:57-65's `random.triangular(-10, 10, mode)`):
    * u < F(c) ⇒ a + sqrt(u (b-a)(c-a)); else b - sqrt((1-u)(b-a)(b-c)).
    */
  def triangular(seed: Long, a: Double, b: Double, c: Double): Column = {
    val u = rand(seed)
    val fc = (c - a) / (b - a)
    when(u < fc, lit(a) + sqrt(u * (b - a) * (c - a)))
      .otherwise(lit(b) - sqrt((lit(1.0) - u) * (b - a) * (b - c)))
  }

  /** F10 — uniform categorical like `random.choice(list)` (weather.py:65). */
  def categorical(seed: Long, values: Seq[String]): Column =
    element_at(
      array(values.map(lit): _*),
      (floor(rand(seed) * values.size) + 1).cast("int"))
}
