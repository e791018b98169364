package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ARRAY<FLOAT|DOUBLE>` embedding columns.
  *
  * Built from Spark's higher-order functions (`zip_with`/`aggregate`), which
  * stay inside whole-stage codegen — no UDF serialization, no Python. The
  * accumulation is a sequential left fold in DOUBLE, which makes results
  * deterministic (independent of partitioning) and bit-identical to a
  * straightforward loop — required for oracle comparison.
  */
object VectorFunctions {

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE> for stable accumulation. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in double precision (sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; NaN when either vector is all-zero (caller filters). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
