package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRow

/** Row helpers shared by the opaque-map operators (enrichment runners,
  * multimodal extractors). */
object RowUtil {

  /** Append columns to a Row with ONE array copy. `r.toSeq :+ a :+ b`
    * copies the row three times per element and `Row.fromSeq` clones
    * its argument again — measurable on 100k+-row mapPartitions paths;
    * building the `GenericRow` directly over the fresh array is the
    * single-copy floor. */
  def appended(r: Row, extras: Any*): Row = {
    val n = r.length
    val arr = new Array[Any](n + extras.length)
    var i = 0
    while (i < n) { arr(i) = r.get(i); i += 1 }
    extras.foreach { e => arr(i) = e; i += 1 }
    new GenericRow(arr)
  }

  /** [[appended]] keeping only the first `keep` fields of `r` — for
    * folds that carry transient join-side columns (e.g. a resume's
    * prior-response pair) the output schema must not expose. */
  def prefixAppended(r: Row, keep: Int, extras: Any*): Row = {
    val arr = new Array[Any](keep + extras.length)
    var i = 0
    while (i < keep) { arr(i) = r.get(i); i += 1 }
    extras.foreach { e => arr(i) = e; i += 1 }
    new GenericRow(arr)
  }
}
