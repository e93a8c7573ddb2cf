package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Pluggable source layer — the reference's three ingest shapes
  * (SURVEY.md §2.1 S1-S6) behind one trait, zero-egress testable.
  *
  * Incremental ingest is modeled exactly like the reference: batch
  * watermark re-reads (file-number > N for files, pushdown key > N for
  * JDBC). The Structured Streaming file source (graft.streaming) is the
  * idiomatic exactly-once upgrade of the same contract.
  */
trait Source {
  def read(spark: SparkSession): DataFrame
}

/** Watermarked CSV directory source (reference S1+S3:
  * ApplaudoETL.scala:79-99): files named `NN.csv`; only numeric
  * basenames strictly greater than `fileNumberGt` are read. Schema is
  * imposed (no inference pass); malformed rows dropped at scan.
  */
case class CsvWatermarkSource(
    path: String,
    schema: StructType,
    fileNumberGt: Int = -1,
    header: Boolean = false,
    escape: String = "\"") extends Source {

  /** List files with numeric basename > watermark (reference
    * getFileNames, ApplaudoETL.scala:94-99). Listing happens once on
    * the driver — at 100 TB the file COUNT (not size) bounds this; for
    * very large containers prefer the streaming file source whose log
    * tracks processed files incrementally. */
  def fileNames(spark: SparkSession): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath)
      .filter { f =>
        val base = f.getName.takeWhile(_ != '.')
        base.nonEmpty && base.forall(_.isDigit) && base.toInt > fileNumberGt
      }
      .map(_.toString)
      .sorted
  }

  override def read(spark: SparkSession): DataFrame = {
    val files = fileNames(spark)
    require(files.nonEmpty, s"no files > $fileNumberGt under $path")
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("escape", escape)
      .option("mode", "DROPMALFORMED")
      .csv(files.toIndexedSeq: _*)
  }
}

/** JDBC source with server-side watermark pushdown (reference S4-S5:
  * ApplaudoETL.scala:110-126): the incremental predicate is embedded in
  * a `dbtable` subquery so it executes on the database, and all-string
  * JDBC columns are normalized to the target schema by per-column cast.
  *
  * Scale: the reference reads on ONE connection; `partitioning`
  * splits the read into `numPartitions` range-parallel connections —
  * required for any sizable table.
  */
case class JdbcSource(
    url: String,
    table: String,
    user: String,
    password: String,
    driver: String,
    watermark: Option[(String, Long)] = None,
    partitioning: Option[JdbcPartitioning] = None) extends Source {

  /** The pushdown subquery (visible for tests; executes server-side). */
  def dbtable: String = watermark match {
    case Some((column, value)) =>
      s"(select * from $table where CAST($column AS bigint) > $value) as t"
    case None => table
  }

  override def read(spark: SparkSession): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("driver", driver)
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
    val partitioned = partitioning.fold(reader) { p =>
      reader
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound.toString)
        .option("upperBound", p.upperBound.toString)
        .option("numPartitions", p.numPartitions.toString)
    }
    partitioned.load()
  }
}

case class JdbcPartitioning(column: String, lowerBound: Long,
                            upperBound: Long, numPartitions: Int)

object JdbcSource {
  /** Normalize an all-string JDBC frame to `target` by per-column cast
    * (reference S5, ApplaudoETL.scala:124-126) — one select, not a
    * withColumn fold. */
  def castTo(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
}

/** Driver-side HTTP JSON source (reference S6, ApplaudoETL.scala:134-142)
  * with an injectable transport for zero-egress tests. Unlike the
  * reference (json4s on the driver), the payload is parsed by Spark's
  * JSON reader — same engine-native path that would be used if the
  * payload lived on executors.
  *
  * Payload shape (FIXTURES.md F3):
  * `{"results":[{"columns":[...],"items":[{product_name,aisle,department}...]}]}`
  */
class HttpJsonSource(url: String,
                     transport: String => String = HttpJsonSource.httpGet)
  extends Source {

  override def read(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val payload = transport(url)
    val raw = spark.read.json(Seq(payload).toDS())
    raw.select(org.apache.spark.sql.functions.explode(col("results")).as("r"))
      .select(org.apache.spark.sql.functions.explode(col("r.items")).as("item"))
      .select(col("item.product_name"), col("item.aisle"), col("item.department"))
  }
}

object HttpJsonSource {
  def httpGet(url: String): String = {
    val src = scala.io.Source.fromURL(url, "UTF-8")
    try src.mkString finally src.close()
  }
}
