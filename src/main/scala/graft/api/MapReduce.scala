package graft.api

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MapReduce facade — the reference's programming model
  * (`/root/reference/src/main.cc`: mapper emits (key, value) pairs from
  * each input record; reducer folds all values of a key) expressed as
  * declarative Dataset transformations, so Catalyst/Tungsten provide
  * what the reference hand-built with pthreads: the shuffle replaces
  * its mutex-guarded merge (`src/main.cc:85-96`), partial aggregation
  * replaces its per-file local sets (`src/main.cc:62-63`), and the task
  * scheduler replaces its shared-counter work queue (`src/main.cc:50-59`).
  *
  * `reduceByKey` uses `reduceGroups` (a `ReduceAggregator` underneath),
  * which aggregates map-side before the exchange — the semantics of a
  * Hadoop combiner, for free.
  */
object MapReduce {

  /** mapper → shuffle → associative reducer. */
  def reduceByKey[I, K, V](input: Dataset[I])(mapper: I => IterableOnce[(K, V)])(
      reducer: (V, V) => V)(implicit
      ek: Encoder[K], ekv: Encoder[(K, V)], ekkv: Encoder[(K, (K, V))]): Dataset[(K, V)] =
    input
      .flatMap(mapper)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, reducer(a._2, b._2)))
      .map(_._2)

  /** mapper → shuffle → full-accumulator reduce via a typed
    * [[Aggregator]] (zero/reduce/merge/finish — the general shape when
    * the reduction isn't a simple fold of V). */
  def aggregateByKey[I, K, V, B, O](input: Dataset[I])(mapper: I => IterableOnce[(K, V)])(
      agg: Aggregator[(K, V), B, O])(implicit
      ek: Encoder[K], ekv: Encoder[(K, V)], eko: Encoder[(K, O)]): Dataset[(K, O)] =
    input
      .flatMap(mapper)
      .groupByKey(_._1)
      .agg(agg.toColumn)

  /** The classic: word count. */
  def wordCount(lines: Dataset[String])(implicit
      ek: Encoder[String], ekv: Encoder[(String, Long)],
      ekkv: Encoder[(String, (String, Long))]): Dataset[(String, Long)] =
    reduceByKey(lines)(l => l.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L))(_ + _)
}
