package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key CDC change detection as a first-class stateful streaming operator:
  * `flatMapGroupsWithState` keeps each issue's high-water mark in Spark's
  * state store (RocksDB/HDFS-backed on a cluster, checkpointed with the
  * query) — the distributed inversion of the reference's driver-side
  * `map[issueKey]IssueState` (reference: pkg/state/manager.go:329-454
  * UpdateIssueState/ShouldSyncIssue; anti-pattern note SURVEY.md §7.4).
  *
  * Semantics mirror [[graft.state.StateStore.changedIssues]] (C1/C2/P4): a
  * key emits one change event per micro-batch iff its newest version moved
  * strictly past the stored watermark — `new` on first sight, `modified`
  * after, with a per-key sync counter; replayed batches are idempotent
  * (at-least-once delivery → exactly-once effect on the emitted change log).
  *
  * The same operator runs unmodified in batch mode (every group sees empty
  * state, so each key emits its latest version as `new`) — that batch twin
  * is the oracle-checked `stream_stateful_changes` query.
  */
object StatefulCdc {

  final case class Update(key: String, project_key: String, updated: Timestamp)
  final case class KeyState(lastUpdated: Timestamp, syncCount: Int)
  final case class Change(key: String, project_key: String, change_type: String,
      updated: Timestamp, sync_count: Int)

  /** One group invocation: fold the batch's versions of `key` into the stored
    * watermark; emit at most one event (the newest version, when it advances
    * the watermark). A timeout invocation (no rows) drops the key's state —
    * the TTL bound on total state size.
    */
  def detect(ttlMs: Option[Long])(key: String, rows: Iterator[Update],
      state: GroupState[KeyState]): Iterator[Change] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // ties on `updated` are byte-identical duplicate versions — maxBy keeping
    // the first is deterministic in effect
    val newest = rows.maxBy(_.updated.getTime)
    val prior = state.getOption
    if (prior.forall(p => newest.updated.after(p.lastUpdated))) {
      val n = prior.map(_.syncCount).getOrElse(0) + 1
      state.update(KeyState(newest.updated, n))
      ttlMs.foreach(state.setTimeoutDuration)
      Iterator.single(Change(key, newest.project_key,
        if (prior.isEmpty) "new" else "modified", newest.updated, n))
    } else {
      ttlMs.foreach(state.setTimeoutDuration) // activity refreshes the TTL
      Iterator.empty
    }
  }

  /** The change-event stream (append mode; works on batch Datasets too).
    *
    * @param ttlMs optional per-key state TTL: a key idle for longer is
    *              evicted from the state store (it re-emits as `new` with a
    *              reset counter on its next update) — the retention bound
    *              that keeps total state ∝ active keys, not ever-seen keys,
    *              at 100 TB. None = keep state forever.
    */
  def changes(updates: Dataset[Update], ttlMs: Option[Long] = None): Dataset[Change] = {
    implicit val stateEnc: Encoder[KeyState] = Encoders.product[KeyState]
    implicit val changeEnc: Encoder[Change] = Encoders.product[Change]
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(detect(ttlMs))
  }
}
