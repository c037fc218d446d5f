package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W × U3 — stream-stream join: the reference's master⊕detail merge
  * (`aracaju_barra_pirambu_scraper.py:205`, detail fields attached to
  * each master row) when BOTH sides arrive continuously.
  *
  * Spark buffers each side in watermark-bounded state and emits matches
  * as they meet. The two requirements that keep state bounded (and that
  * this operator enforces rather than documents):
  *   - a watermark on BOTH inputs, and
  *   - a time-range predicate tying the two event times, so Spark can
  *     evict a buffered row once no future match can exist for it.
  * Without the range bound the state store grows forever — the
  * streaming analog of an unbounded shuffle.
  */
object StreamingJoin {

  /** Join master rows to detail rows on `keyCol`, accepting details
    * whose event time lies within [master ts − `lookback`, master ts].
    * Both frames must carry `tsCol`; output columns are the master's
    * plus the detail's (detail ts aliased `detail_ts`). */
  def masterDetail(master: DataFrame, detail: DataFrame,
                   keyCol: String, tsCol: String,
                   lookback: String, delay: String): DataFrame = {
    val m = master.withWatermark(tsCol, delay)
    val d = detail.withWatermark(tsCol, delay)
      .withColumnRenamed(tsCol, "detail_ts")
      .withColumnRenamed(keyCol, "_dkey")
    m.join(d,
      m(keyCol) === d("_dkey") &&
        d("detail_ts") >= m(tsCol) - expr(s"INTERVAL $lookback") &&
        d("detail_ts") <= m(tsCol))
      .drop("_dkey")
  }
}
