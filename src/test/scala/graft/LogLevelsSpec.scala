package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SHAPE of the entry-point log hygiene: the WindowExec
  * suppression must be the message-scoped regex filter, not a class-level
  * level raise — a novel WindowExec warning (a genuinely unpartitioned
  * corpus window in a new operator) must still be loggable at WARN.
  */
class LogLevelsSpec extends AnyFunSuite {

  test("WindowExec keeps WARN; only the known bounded-frame message is filtered") {
    LogLevels.quietCheckpointRelease()
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val name = "org.apache.spark.sql.execution.window.WindowExec"
    val lc = ctx.getConfiguration.getLoggerConfig(name)
    assert(lc.getName === name, "a dedicated logger config must exist")
    assert(lc.getLevel.isLessSpecificThan(Level.WARN),
      s"WindowExec must still log WARN-level messages, got ${lc.getLevel}")
    val filter = lc.getFilter
    assert(filter != null, "the message regex filter must be installed")
    // the known message is denied; any other warning passes through
    import org.apache.logging.log4j.core.Filter
    import org.apache.logging.log4j.message.SimpleMessage
    val logger = ctx.getLogger(name)
    def result(msg: String): Filter.Result =
      filter.filter(logger, Level.WARN, null, new SimpleMessage(msg),
        null.asInstanceOf[Throwable])
    assert(result("No Partition Defined for Window operation! Moving all data " +
      "to a single partition.") === Filter.Result.DENY)
    assert(result("some genuinely novel window degradation") !==
      Filter.Result.DENY)
  }
}
