package graft.sources

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, Driver, DriverPropertyInfo, SQLFeatureNotSupportedException, Statement}
import java.util.Properties
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import java.util.logging.Logger

/** Instrumentation JDBC driver: `jdbc:counting:derby:…` URLs delegate to
  * embedded Derby while counting every physical `connect` and every
  * executed statement (each command of an `executeBatch` counts once).
  *
  * Two proofs hang off these counters:
  *   - JdbcSinkSpec: [[JdbcSink.append]] fans out one connection per
  *     Spark partition (the "1000 parallel bulk loaders" claim);
  *   - BenchScale's `cdc_serve` gate: the
  *     [[graft.streaming.CdcStream.startToJdbc]] delta push issues
  *     O(batch) statements against a ×N state — the reference's per-key
  *     mutation posture (clickhouse/client.go:249-335) held to at scale.
  *
  * Counters are JVM-global atomics — valid in `local[*]` where driver
  * and executors share the JVM (everywhere this engine is measured).
  */
class CountingDriver extends Driver {
  import CountingDriver._

  override def acceptsURL(url: String): Boolean = url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      connects.incrementAndGet()
      countingConnection(delegate.connect(url.replace(Prefix, "jdbc:"), info))
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
  val statements = new AtomicLong(0L)
  private lazy val delegate = new org.apache.derby.jdbc.EmbeddedDriver

  /** Idempotent DriverManager registration for the JVM. */
  lazy val registered: Unit =
    java.sql.DriverManager.registerDriver(new CountingDriver)

  /** Reflective pass-through proxy that rethrows the delegate's own
    * exception (not the reflection wrapper), so SQLState-based error
    * mapping upstream still sees the real SQLException. */
  private def passThrough(target: AnyRef, ifaces: Array[Class[_]])(
      post: (Method, AnyRef) => AnyRef): AnyRef =
    Proxy.newProxyInstance(target.getClass.getClassLoader, ifaces,
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          val r =
            try m.invoke(target, a: _*)
            catch { case e: InvocationTargetException => throw e.getCause }
          post(m, r)
        }
      })

  private def countingConnection(c: Connection): Connection =
    passThrough(c, Array(classOf[Connection])) { (m, r) =>
      m.getName match {
        case "createStatement" | "prepareStatement" | "prepareCall" =>
          countingStatement(r.asInstanceOf[Statement])
        case _ => r
      }
    }.asInstanceOf[Connection]

  private def countingStatement(st: Statement): Statement = {
    val ifaces: Array[Class[_]] = st match {
      case _: java.sql.CallableStatement =>
        Array(classOf[java.sql.CallableStatement])
      case _: java.sql.PreparedStatement =>
        Array(classOf[java.sql.PreparedStatement])
      case _ => Array(classOf[Statement])
    }
    passThrough(st, ifaces) { (m, r) =>
      m.getName match {
        case "executeBatch" =>
          statements.addAndGet(r.asInstanceOf[Array[Int]].length.toLong)
        case "executeLargeBatch" =>
          statements.addAndGet(r.asInstanceOf[Array[Long]].length.toLong)
        case "execute" | "executeQuery" | "executeUpdate" |
            "executeLargeUpdate" =>
          statements.incrementAndGet()
        case _ => ()
      }
      r
    }.asInstanceOf[Statement]
  }
}
