package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state over blocking keys via `flatMapGroupsWithState` —
  * the Spark-native stateful operator the windowed [[StreamingIngest
  * .blockStats]] aggregation can't express: a block is SETTLED once no page
  * has arrived for it for `gapMinutes` of EVENT time, at which point exactly
  * one summary row is emitted and the block's state is evicted.
  *
  * This is the precise trigger feed an incremental linkage consumer wants:
  * [[IncrementalLinkage]] re-pairs a block on every touch, so re-pairing is
  * cheapest when a block's membership has stopped churning — the settled
  * stream IS that signal, one row per block per quiet period, instead of a
  * per-window count the consumer must diff.
  *
  * Scale posture: state is one 24-byte struct per LIVE (recently touched)
  * block, partitioned by key across executors in the state store (RocksDB
  * at deployment scale), checkpointed with the query — a restart resumes
  * counts exactly (spec drives two runs over one checkpoint). Event-time
  * timeout + watermark bound the state: quiet blocks leave the store, so
  * the store holds the churn front, not the 10^12-row key space.
  */
object BlockSessions {

  /** One page arrival projected to its block (input shape). */
  case class BlockPage(block_key: String, warc_ts: java.sql.Timestamp)

  /** Per-block live state: page count + first/last event time (epoch ms). */
  case class BlockState(n: Long, firstTs: Long, lastTs: Long)

  /** Emitted when a block settles (quiet for the gap, by event time). */
  case class SettledBlock(block_key: String, n_pages: Long,
                          first_ts: java.sql.Timestamp,
                          last_ts: java.sql.Timestamp)

  /** The settled-block stream over prepared pages (needs `block_key` and
    * `warc_ts` columns; caller sets the watermark delay upstream —
    * [[StreamingIngest.prepared]] + `withWatermark` — because the watermark
    * governs when timeouts fire). */
  def settled(prepared: DataFrame, gapMinutes: Int = 60): Dataset[SettledBlock] = {
    val spark = prepared.sparkSession
    import spark.implicits._
    prepared.select("block_key", "warc_ts").as[BlockPage]
      .groupByKey(_.block_key)
      .flatMapGroupsWithState[BlockState, SettledBlock](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, pages: Iterator[BlockPage], state: GroupState[BlockState]) =>
          if (state.hasTimedOut) {
            // quiet past the watermark: emit ONE summary, evict the state
            val s = state.get
            state.remove()
            Iterator.single(SettledBlock(key, s.n,
              new java.sql.Timestamp(s.firstTs), new java.sql.Timestamp(s.lastTs)))
          } else {
            val ts = pages.map(_.warc_ts.getTime).toSeq
            val prev = state.getOption.getOrElse(BlockState(0L, Long.MaxValue, Long.MinValue))
            val next = BlockState(prev.n + ts.size,
              math.min(prev.firstTs, ts.min), math.max(prev.lastTs, ts.max))
            state.update(next)
            // event-time timeout: fires once the WATERMARK passes last+gap
            state.setTimeoutTimestamp(next.lastTs + gapMinutes * 60000L)
            Iterator.empty
          }
      }
  }
}
