package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared net-state fold for the index `syncFromChanges` family.
  *
  * A change-feed RANGE can touch one key several times, and the naive
  * split — delete the delete/preimage ids, append every
  * insert/postimage row — is wrong in exactly two ways:
  *
  *   - a key inserted then DELETED inside the range has no existing
  *     posting to remove, and its earlier insert row would be appended
  *     anyway — resurrecting a deleted document through the index;
  *   - a key updated twice appends BOTH postimages: the stale
  *     intermediate payload lingers as a duplicate posting that can rank
  *     into search results.
  *
  * The fix is per-key LAST-WRITER-WINS over `_commit_version`: every
  * touched key's old postings are removed, and only keys whose LATEST
  * change leaves them alive are re-appended, once, with the final
  * payload. (Within one version a key has at most one non-preimage row —
  * a commit is one DML operation — so the ordering is total.)
  */
object IndexSync {

  /** `(touched, alive)`: every changed key (old postings must go
    * regardless of final state), and one payload row per key whose final
    * state in the range is live. `feed` must carry `_change_type` AND
    * `_commit_version`. */
  def net(feed: DataFrame, idCol: String, payloadCols: Seq[String])
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy(idCol).orderBy(col("_commit_version").desc)
    val finals = feed
      .filter(col("_change_type").isin("insert", "update_postimage", "delete"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
    val touched = feed.select(col(idCol)).distinct()
    val alive = finals.filter(col("_change_type") =!= "delete")
      .select(idCol, payloadCols: _*)
    (touched, alive)
  }
}
