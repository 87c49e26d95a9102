package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.parse.Parsers
import graft.streaming.EventStreams

/** Property tests (SURVEY.md §5.4): positional-percentile semantics vs a
  * naive model, RF-normalization round-trip, dedup-after-sort ≡
  * max-per-key, parser row-count invariance under block shuffling. */
class PropertiesSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("positional percentile equals the naive sorted-pick model") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0.0, 10000.0))
    (0 until 100).foreach { i =>
      val xs = sample(gen, i.toLong)
      val sorted = xs.sorted.toVector
      for (q <- Seq(0.5, 0.75, 0.9, 0.95, 0.98, 0.99)) {
        // naive model: 1-based index round_half_up(n·q) clamped to [1, n]
        val idx = math.min(math.max(math.floor(sorted.length * q + 0.5).toLong, 1L),
          sorted.length.toLong).toInt
        assert(EventStreams.pick(sorted, q) == sorted(idx - 1), s"i=$i q=$q")
      }
    }
  }

  test("RF normalization round-trip: sum(count/rf across nodes)·rf = total") {
    val gen = for {
      rf <- Gen.chooseNum(1, 5)
      counts <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000L))
    } yield (rf, counts)
    (0 until 100).foreach { i =>
      val (rf, counts) = sample(gen, 1000L + i)
      val normalizedSum = counts.map(_.toDouble / rf).sum
      assert(math.abs(normalizedSum * rf - counts.sum.toDouble) < 1e-6 * counts.sum)
    }
  }

  test("dedup-after-desc-sort keeps exactly the max per key (A11)") {
    val gen = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(0, 10)
      v <- Gen.chooseNum(0, 1000)
    } yield (k, v))
    (0 until 100).foreach { i =>
      val rows = sample(gen, 2000L + i)
      // reference shape: sort desc by value, keep first occurrence per key
      val firstWins = rows.sortBy(-_._2).distinctBy(_._1).map(r => r._1 -> r._2).toMap
      val maxPerKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(firstWins == maxPerKey, s"i=$i")
    }
  }

  test("cfstats parser: metric row count invariant under keyspace-block shuffling") {
    def block(ks: String, tbl: String, n: Int): Seq[String] =
      s"Keyspace : $ks" +: s"\tTable: $tbl" +:
        (0 until n).map(j => s"\t\tmetric$j: $j") :+ ""
    val blocks = Seq(block("a", "t1", 3), block("b", "t2", 5), block("c", "t3", 2))
    val perms = Seq(blocks, blocks.reverse, Seq(blocks(1), blocks(2), blocks(0)))
    val counts = perms.map { p =>
      Parsers.parseCfstats("n", p.flatten.iterator)
        .filter(_.table.nonEmpty).toList
    }
    assert(counts.forall(_.size == 10))
    // identical row multisets regardless of block order
    assert(counts.map(_.toSet).distinct.size == 1)
  }

  test("ngram_stats kernel equals a naive Scala model on random texts") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // random texts over a tiny vocab + whitespace noise → dense gram
    // collisions, the regime where count/tie bugs live
    val word = Gen.oneOf("a", "b", "ab", "Ba", "", " ", "\t", "x y")
    val textGen = Gen.listOfN(12, word).map(_.mkString(" "))
    def model(text: String, n: Int): Option[(Long, Long, String, Long)] = {
      val toks = text.trim.toLowerCase.split("\\s+", -1).filter(_.nonEmpty).toSeq
      if (toks.length < n) None
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val cnt = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val top = cnt.toSeq.minBy { case (g, c) => (-c, g) }
        Some((grams.size.toLong, cnt.size.toLong, top._1, top._2))
      }
    }
    for (i <- 0 until 300; n <- Seq(2, 3)) {
      val text = sample(textGen, 9000L + i)
      val e = graft.functions.NgramStats(
        BoundReference(0, StringType, nullable = false), Literal(n, IntegerType))
      val row = org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(text))
      val got = Option(e.eval(row)).map { r =>
        val s = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        (s.getLong(0), s.getLong(1), s.getUTF8String(2).toString, s.getLong(3))
      }
      assert(got == model(text, n), s"n=$n text=<$text>")
    }
  }

  test("minhash-style modular hash family stays in [0, P)") {
    val P = 2147483647L
    val gen = Gen.chooseNum(0L, (1L << 60) - 1)
    (0 until 200).foreach { i =>
      val h = sample(gen, 3000L + i) % P
      (0 to 15).foreach { k =>
        val mh = ((1L + k * 604271L) * h + (7L + k * 202409L)) % P
        assert(mh >= 0 && mh < P)
      }
    }
  }
}
