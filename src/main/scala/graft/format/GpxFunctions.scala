package graft.format

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 `bucket(numBuckets, key)` function backing storage-partitioned
  * joins over the bucketed gpx layout: Spark resolves the table's bucket
  * Transform against this function (via GpxCatalog's FunctionCatalog) and
  * can then co-locate equi-joins on the bucket key with ZERO shuffle —
  * the reference feeds its hash-partitioned files straight into
  * partitioned join workers the same way
  * (pixels-turbo/.../BasePartitionedJoinWorker.java:180).
  *
  * MUST stay consistent with [[GpxTable.bucketOf]] (the function that
  * routes writes and prunes point lookups) — null keys hash like the
  * writer's null placeholder 0L. */
object GpxBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "bucket(numBuckets, key): gpx hash bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    // the FunctionCatalog bind contract signals unbindable input with
    // UnsupportedOperationException (clean AnalysisException), not
    // require's IllegalArgumentException (internal-error style)
    if (inputType.fields.length != 2)
      throw new UnsupportedOperationException(
        s"bucket expects (numBuckets, key), got $inputType")
    inputType.fields(1).dataType match {
      case kt @ (LongType | IntegerType | ShortType | ByteType | DateType) =>
        BoundBucket(kt)
      case other =>
        throw new UnsupportedOperationException(s"bucket key type $other")
    }
  }

  final case class BoundBucket(keyType: DataType) extends ScalarFunction[Int] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "gpx.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Int = {
      val n = input.getInt(0)
      val key: Long =
        if (input.isNullAt(1)) 0L // writer routes null keys as 0L
        else keyType match {
          case LongType => input.getLong(1)
          case IntegerType | DateType => input.getInt(1).toLong
          case ShortType => input.getShort(1).toLong
          case ByteType => input.getByte(1).toLong
          case other => throw new IllegalStateException(other.toString)
        }
      GpxTable.bucketOf(key, n)
    }
  }
}
