package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, RowOrdering, SortOrder, SortPrefix, UnsafeProjection}
import org.apache.spark.sql.execution.{SortPrefixUtils, UnsafeExternalRowSorter}
import org.apache.spark.sql.types.StructType

/** Bridge to the spill-capable row sorter `SortExec` uses
  * (`UnsafeExternalRowSorter` + the `private[sql]` `SortPrefixUtils`):
  * custom physical operators that need a sort-based fallback get the
  * exact same external-sort machinery — task-memory-managed pages,
  * disk spill under pressure, prefix-accelerated comparisons — instead
  * of hand-rolling a spill file format.
  */
object SortBridge {

  /** A spillable sorter over `output`-shaped rows ordered by `sortOrder`.
    * Mirrors SortExec.createSorter (radix disabled — multi-column
    * orderings can't sort fully by prefix).
    */
  def createSorter(sortOrder: Seq[SortOrder],
                   output: Seq[Attribute]): UnsafeExternalRowSorter = {
    val ordering = RowOrdering.create(sortOrder, output)
    val boundSortExpression =
      BindReferences.bindReference(sortOrder.head, output)
    val prefixComparator =
      SortPrefixUtils.getPrefixComparator(boundSortExpression)
    val prefixExpr = SortPrefix(boundSortExpression)
    val prefixProjection = UnsafeProjection.create(Seq(prefixExpr))
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        val prefix = prefixProjection.apply(row)
        result.isNull = prefix.isNullAt(0)
        result.value =
          if (result.isNull) prefixExpr.nullValue else prefix.getLong(0)
        result
      }
    }
    val pageSize = SparkEnv.get.memoryManager.pageSizeBytes
    UnsafeExternalRowSorter.create(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(output),
      ordering, prefixComparator,
      prefixComputer, pageSize, false)
  }
}
