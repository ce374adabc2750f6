package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exactly-once-per-key dedup: the state-store variant
  * of the reference's processed-set anti-join
  * (/root/reference/setup.sql:222) for CONTINUOUS ingestion — each key's
  * first occurrence passes, replays and late duplicates are dropped, with
  * the seen-set held in Spark's versioned state store instead of a table
  * scan. [north-rule extension; SURVEY.md X5.]
  *
  * At 10^12 keys the state store shards by key across executors and
  * checkpoints incrementally — this is the shape that scales, vs. an
  * anti-join against an ever-growing output table every micro-batch.
  */
object StatefulDedup {

  /** First-occurrence filter over a keyed stream. */
  def firstOccurrence[T](ds: Dataset[T], key: T => String)
                        (implicit enc: org.apache.spark.sql.Encoder[T])
      : Dataset[T] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }
}
