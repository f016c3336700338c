package graft

import org.scalacheck.Gen
import graft.schemas.Transit._

/** Property-based invariants (SURVEY.md §5 "rebuild test strategy") — plain
  * ScalaCheck generators sampled in-loop (scalatestplus bridge not on the
  * offline classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("sanitizer is idempotent and produces only [a-z0-9_.] for plausible names") {
    val nameGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '/', '-', '\''))).map(_.mkString)
    samples(nameGen, 200).foreach { name =>
      val once = sanitizeName(name)
      assert(sanitizeName(once) == once, s"not idempotent for: $name")
      assert(once.forall(c => c.isLower || c.isDigit || c == '_'),
        s"unexpected char in: $once")
    }
  }

  test("O3 invariant: each platform holds the train of its latest change event") {
    // arbitrary arrival sequences over 3 stations, 2 trains, strictly
    // increasing timestamps (the reference's per-topic ordering)
    val arrivalsGen: Gen[List[Arrival]] = for {
      n <- Gen.choose(1, 25)
      moves <- Gen.listOfN(n, for {
        sid <- Gen.oneOf(10, 20, 30)
        dir <- Gen.oneOf("a", "b")
        train <- Gen.oneOf("RL001", "RL002")
        prevSid <- Gen.option(Gen.oneOf(10, 20, 30))
        prevDir <- Gen.oneOf("a", "b")
      } yield (sid, dir, train, prevSid, prevDir))
    } yield moves.zipWithIndex.map { case ((sid, dir, train, prevSid, prevDir), i) =>
      Arrival(1000L + i, sid, train, dir, "red", "in_service",
        prevSid, prevSid.map(_ => prevDir))
    }

    samples(arrivalsGen, 15).filter(_.nonEmpty).foreach { arrivals =>
      val out = graft.operators.Transit.trainPositions(arrivals.toDF())
        .collect()
        .map(r => (r.getInt(0), r.getString(1)) -> Option(r.getAs[String]("train_id")))
        .toMap
      // oracle: replay sequentially (depart applied before arrive per event)
      var state = Map.empty[(Int, String), Option[String]]
      arrivals.foreach { a =>
        for { ps <- a.prev_station_id; pd <- a.prev_direction }
          state = state.updated((ps, pd), None)
        state = state.updated((a.station_id, a.direction), Some(a.train_id))
      }
      assert(out == state)
    }
  }

  test("A1 invariant: grouped count equals per-key input cardinality") {
    val eventsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 10L), Gen.oneOf("a", "b", "c")))
    samples(eventsGen, 10).foreach { events =>
      val out = graft.operators.Relational
        .groupedCount(events.toDF("user_id", "event_type"))
        .as[(Long, Long)].collect().toMap
      val expect = events.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(out == expect)
    }
  }
}
