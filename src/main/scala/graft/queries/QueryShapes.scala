package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Shared plan shapes for the gate surface. */
object QueryShapes {

  /** Total order on `keys` placed BELOW downstream per-row compute:
    * `repartitionByRange(defaultParallelism, keys) +
    * sortWithinPartitions(keys)` — range partitions are ordered, rows
    * sorted within, and order-preserving projections keep it, so a
    * consumer that projects expensive columns above this needs no final
    * `orderBy`. The point (README r12, `SortSampleLintSpec`): a global
    * sort ABOVE the projection makes `RangePartitioner`'s reservoir
    * sample re-run the whole scoring pass; here the sample only sees
    * the cheap input. The numbered partition count scales with the
    * cluster (`defaultParallelism`), and doubles as the usual AQE-proof
    * parallelizer for the one-row-group testdata scan.
    */
  def orderedBelow(df: DataFrame, keys: Column*): DataFrame =
    df.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*)
}
