package graft.infer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bridges [[InferenceClient]] into DataFrame plans.
  *
  * `mapPartitions` with explicit batching (not a per-row UDF): one client per
  * partition-task, `batchSize` prompts per transport call — the Spark
  * equivalent of the reference's Module/Neuron gevent fan-out with a
  * semaphore-capped connection pool (SURVEY.md D10). Partition width (set by
  * the caller via `repartition`) IS the concurrency cap: 1000 executors →
  * 1000 concurrent client instances, each batching — no driver-side loop,
  * no collect.
  */
object InferOps {

  /** Append `outCol` = client.complete(row[promptCol]) to every row. */
  def complete(
      df: DataFrame,
      promptCol: String,
      outCol: String,
      client: InferenceClient,
      batchSize: Int = 16): DataFrame = {
    val schema    = df.schema
    val promptIdx = schema.fieldIndex(promptCol)
    val outSchema = StructType(schema.fields :+ StructField(outCol, StringType))
    val enc       = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val replies = client.completeBatch(batch.map(_.getString(promptIdx)))
        batch.lazyZip(replies).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(enc)
  }
}
