package graft

import java.util.Properties

import org.apache.spark.sql.functions._

import graft.io.{JdbcSink, JdbcSource, Sinks}

/** S3/K3 hard-green: the JDBC seam driven end-to-end through EMBEDDED
  * Derby (ships with Spark's jars — in-process, zero network), upgrading
  * the sink/source pair from "compiles against the API, parquet stands in"
  * to a real write→read round-trip: table auto-creation, append semantics,
  * type mapping through Spark's DerbyDialect, and the partitioned parallel
  * scan path that production JDBC reads must use.
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val derbyHome = {
    val d = tmpDir("graft_derby")
    // derby.log and the db live under the managed tmp dir, not user.dir
    System.setProperty("derby.system.home", d)
    d
  }
  private lazy val url = s"jdbc:derby:$derbyHome/graftdb;create=true"
  private def props = new Properties()

  private val rows = Set((1L, "alpha", 3.5), (2L, "beta", -1.0), (3L, "gamma", 0.0))

  test("K3/S3: JdbcSink write -> JdbcSource read round-trips through embedded Derby") {
    val df = rows.toSeq.toDF("id", "name", "score")
    new JdbcSink(url, "t_roundtrip", props).write(df)
    val back = new JdbcSource(url, "t_roundtrip", props).read(spark)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet == Set("id", "name", "score"))
    assert(back.select("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == rows)
    // K3 is an APPEND sink: a second write adds, never replaces
    new JdbcSink(url, "t_roundtrip", props).write(df)
    assert(new JdbcSource(url, "t_roundtrip", props).read(spark).count() == 6)
  }

  test("S3: partitioned JDBC scan (the parallel production path) sees the same rows") {
    val df = rows.toSeq.toDF("id", "name", "score")
    new JdbcSink(url, "t_partitioned", props).write(df)
    val p = props
    p.setProperty("partitionColumn", "id")
    p.setProperty("lowerBound", "1")
    p.setProperty("upperBound", "4")
    p.setProperty("numPartitions", "3")
    val back = new JdbcSource(url, "t_partitioned", p).read(spark)
    assert(back.rdd.getNumPartitions == 3, "scan did not split into range partitions")
    assert(back.select("id", "name", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == rows)
  }

  test("S3: predicates push down into the JDBC scan") {
    val df = rows.toSeq.toDF("id", "name", "score")
    new JdbcSink(url, "t_pushdown", props).write(df)
    val filtered = new JdbcSource(url, "t_pushdown", props).read(spark)
      .filter(col("id") > 1)
    // Spark compiles supported predicates into the remote query
    // (JDBCRelation PushedFilters) — the scan must not fetch the whole
    // table and filter engine-side
    val scan = filtered.queryExecution.executedPlan.toString
    // the * marker means the filter is FULLY handled by the remote side
    assert(scan.contains("PushedFilters") && scan.contains("*GreaterThan(id,1)"),
      s"filter not pushed into the JDBC scan:\n$scan")
    assert(filtered.count() == 2)
  }

  test("K1+K3: checkpointed streaming foreachBatch into the JDBC sink") {
    val src = tmpDir("graft_jdbc_stream_src")
    val ckpt = tmpDir("graft_jdbc_stream_ckpt")
    rows.toSeq.toDF("id", "name", "score").write.parquet(s"$src/b0")
    val stream = spark.readStream
      .schema("id LONG, name STRING, score DOUBLE")
      .parquet(s"$src/*")
    val q = Sinks
      .streamInto(stream, new JdbcSink(url, "t_streamed", props), ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(new JdbcSource(url, "t_streamed", props).read(spark).count() == 3)
  }
}
