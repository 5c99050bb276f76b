package graft.sources

import java.sql.{Connection, Driver, DriverPropertyInfo, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.concurrent.atomic.AtomicInteger
import java.util.logging.Logger

/** Test-only JDBC driver that delegates `jdbc:counting:derby:…` URLs to
  * embedded Derby and counts every physical `connect` — the
  * instrumentation JdbcSinkSpec uses to prove [[JdbcSink.append]] fans
  * out one connection per Spark partition (the "1000 parallel bulk
  * loaders" claim, made measurable). */
class CountingDriver extends Driver {
  import CountingDriver._

  override def acceptsURL(url: String): Boolean = url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      connects.incrementAndGet()
      delegate.connect(url.replace(Prefix, "jdbc:"), info)
    }

  override def getPropertyInfo(url: String,
      info: Properties): Array[DriverPropertyInfo] =
    Array.empty

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new SQLFeatureNotSupportedException()
}

object CountingDriver {
  val Prefix = "jdbc:counting:"
  val connects = new AtomicInteger(0)
  private lazy val delegate = new org.apache.derby.jdbc.EmbeddedDriver

  /** Idempotent DriverManager registration for the test JVM. */
  lazy val registered: Unit =
    java.sql.DriverManager.registerDriver(new CountingDriver)
}
