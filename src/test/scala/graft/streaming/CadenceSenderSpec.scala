package graft.streaming

import graft.SparkSpec
import graft.core.Schemas
import org.scalatest.funsuite.AnyFunSuite

class CadenceSenderSpec extends AnyFunSuite {
  import CadenceSender._

  test("cadence table matches the reference sleep chain (senders.py:104-120)") {
    val reference = Map("1m" -> 1L, "5m" -> 5L, "15m" -> 15L, "30m" -> 30L,
      "1h" -> 60L, "6h" -> 360L, "12h" -> 720L, "1D" -> 1440L, "7D" -> 10080L)
    reference.foreach { case (iv, secs) =>
      assert(cadenceSecs(iv) == secs, s"cadence for $iv")
    }
    // declared-but-unlisted intervals follow the same seconds/60 rule
    // instead of the reference's hot spin
    assert(cadenceSecs("3h") == Schemas.intervalSeconds("3h") / 60)
    // calendar intervals cap at the weekly cadence
    assert(cadenceSecs("1M") == 10080L)
  }

  test("run loop: fetch-send-sleep per tick; empty fetches send nothing") {
    val sub = Subscription("bitfinex", "BTC", "USD", "1h")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    var calls = 0
    CadenceSender.run[String](sub, ticks = 4,
      fetchLatest = _ => { calls += 1; if (calls == 2) None else Some(s"candle$calls") },
      send = (_, c) => sent += c,
      sleeper = sleeps += _)
    assert(sleeps.toSeq == Seq(60L, 60L, 60L, 60L))
    assert(sent.toSeq == Seq("candle1", "candle3", "candle4"), "None ticks skip the send")
  }
}
