package graft

import java.nio.file.Files
import java.util.Properties
import graft.sources.Sinks

/** JDBC sink parity (ref: etl/loader.py:50-83 appends the star schema into
  * MySQL): write-append-read-back against embedded Derby — a real JDBC
  * round trip, not a mock.
  */
class SinksSpec extends SparkTestBase {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc sink: append mode accumulates rows across loads") {
    import spark.implicits._
    val df = Seq((1, "Truffle Jam", 12.50), (2, "Goat Cheese", 18.00))
      .toDF("id", "name", "price")
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-derby")}/db;create=true"

    Sinks.jdbc(df, url, "t_sales", user = "app", password = "app", driver = Driver)
    val props = new Properties()
    props.setProperty("driver", Driver)
    assert(spark.read.jdbc(url, "t_sales", props).count() == 2)

    // append semantics (the reference's load mode): a second load adds rows
    Sinks.jdbc(df, url, "t_sales", user = "app", password = "app", driver = Driver)
    val back = spark.read.jdbc(url, "t_sales", props)
    assert(back.count() == 4)
    assert(back.columns.toSeq == Seq("id", "name", "price"))
  }
}
