package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomContainsLong

/** Bloom semi-join reduction: filter the FACT side of a selective join
  * with a Bloom filter of the dimension side's join keys BEFORE the
  * fact side shuffles. The pattern for joins where the dim side is too
  * large to broadcast (sort-merge territory) but the join is selective:
  * most fact rows match nothing and would ride the exchange only to be
  * dropped by the probe. With the reduction, shuffle bytes scale with
  * the join's selectivity instead of the fact table — at 100 TB the
  * difference between shuffling a table and shuffling an answer.
  *
  * Exactness is unconditional: Bloom false POSITIVES pass the filter
  * but are dropped by the exact join that still runs; false negatives
  * are impossible (Bloom's contract), so no matching row is lost. The
  * suite drives a deliberately tiny filter (high fpp) to prove the
  * false-positive path; q129 pins equality to the plain-join oracle.
  *
  * Composition is EAGER on the dim side: `stat.bloomFilter` runs one
  * aggregation job over the dim keys and ships a driver-sized bit
  * array (`-n·ln(fpp)/ln²2` bits — ~1.2 MB for 1M keys at 1%), which
  * rides into [[graft.functions.BloomContainsLong]], a codegen'd
  * expression the fact scan evaluates inline — same eager-sketch
  * discipline as IntervalJoin's bounds job, and the dim is scanned
  * again by the join itself (twice total, both dim-sized).
  *
  * Spark's own runtime bloom join (`runtime.bloomFilter.enabled`)
  * makes the same transformation adaptively; this operator is the
  * explicit form for when the pipeline KNOWS the selectivity (a
  * curated id list, an admission set) and wants the reduction
  * guaranteed, not cost-model-dependent.
  */
object BloomJoinReduce {

  /** Inner join of `fact` and `dim` on long keys, with the fact side
    * bloom-reduced before any exchange.
    *
    * @param expectedDimKeys sizing for the filter (distinct dim keys)
    * @param fpp             false-positive rate: smaller = bigger filter,
    *                        fewer wasted shuffle rows
    */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedDimKeys > 0, "expectedDimKeys must be positive")
    require(fpp > 0 && fpp < 1, "fpp in (0, 1)")
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val reduced = fact.filter(BloomContainsLong(col(factKey), bloom))
    if (factKey == dimKey) reduced.join(dim, Seq(factKey))
    else reduced.join(dim, col(factKey) === dim(dimKey))
  }
}
