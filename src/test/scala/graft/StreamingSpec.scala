package graft

import graft.operators.EventWindows
import graft.streaming.StreamingTwin
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkSuite {

  test("streaming tumbling aggregation equals the batch query") {
    val stream = StreamingTwin.runTumblingDemo(spark, sfDir)
    val batch = EventWindows.tumbling(Tables.events(spark, sfDir))
    assert(stream.count() > 0)
    assert(batch.exceptAll(stream).count() == 0)
    assert(stream.exceptAll(batch).count() == 0)
  }
}
