package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one per test JVM; sbt
  * forks a single test JVM, so suites reuse it). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("4")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import scala.jdk.CollectionConverters._

  def df(schema: String, rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** Collect a single-column DataFrame to a Seq for assertions. */
  def col1[T](d: DataFrame): Seq[T] =
    d.collect().toSeq.map(_.getAs[T](0))
}
