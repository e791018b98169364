package graft.functions

import graft.SparkTestBase
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** PassJoin segment blocking: candidate generation must be recall-complete
  * for every pair within edit distance k (the pigeonhole lemma), and the
  * full join must agree with the deletion-neighborhood variant where both
  * apply. */
class PassJoinSpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 120)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private def indexKeys(s: String, k: Int): Set[String] =
    HashKernels.passjoinIndexKeys(UTF8String.fromString(s), k)
      .toObjectArray(StringType).map(_.toString).toSet

  private def probeKeys(s: String, k: Int): Set[String] =
    HashKernels.passjoinProbeKeys(UTF8String.fromString(s), k)
      .toObjectArray(StringType).map(_.toString).toSet

  /** Apply exactly `nEdits` random single-char edits (ins/del/sub), so
    * lev(s, result) ≤ nEdits by construction. */
  private def mutate(s: String, nEdits: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    var cur = s
    (0 until nEdits).foreach { _ =>
      val pos = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
      val ch  = ('a' + rnd.nextInt(26)).toChar
      cur = rnd.nextInt(3) match {
        case 0 if cur.nonEmpty => cur.substring(0, pos) + cur.substring(pos + 1)
        case 1                 => cur.substring(0, pos) + ch + cur.substring(pos)
        case _ if cur.nonEmpty =>
          cur.substring(0, pos) + ch + cur.substring(pos + 1)
        case _ => cur
      }
    }
    cur
  }

  test("candidate keys intersect for every pair within distance k (recall)") {
    val gen = for {
      len   <- Gen.choose(0, 24)
      s     <- Gen.listOfN(len, Gen.alphaLowerChar).map(_.mkString)
      k     <- Gen.choose(1, 4)
      edits <- Gen.choose(0, 4)
      seed  <- Gen.choose(0L, Long.MaxValue)
    } yield (s, k, math.min(edits, k), seed)
    forAll(gen) { case (s, k, edits, seed) =>
      val t = mutate(s, edits, seed)
      assert(probeKeys(s, k).intersect(indexKeys(t, k)).nonEmpty,
        s"no candidate for probe='$s' index='$t' k=$k")
    }
  }

  test("segmented join at k<=2 agrees with the deletion-neighborhood join") {
    import spark.implicits._
    val names = Seq("alpha", "alphb", "alpzb", "beta", "betta", "gamma",
      "gamme", "gam", "", "a", "ab").toDF("name")
    for (k <- Seq(1, 2)) {
      val l = names.select(col("name").as("name_a"))
      val r = names.select(col("name").as("name_b"))
      val seg = Relational.fuzzyJoinSegmented(l, r, "name_a", "name_b", k)
        .select("name_a", "name_b").collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      val del = Relational.fuzzyJoinBlocked(l, r, "name_a", "name_b", k)
        .select("name_a", "name_b").collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      assert(seg == del, s"k=$k: segmented ${seg.size} vs deletion ${del.size}")
    }
  }

  test("segmented join plans as an equi-join, never a nested loop") {
    import spark.implicits._
    val l = (0 until 200).map(i => s"key number $i").toDF("name_a")
    val r = (0 until 200).map(i => s"key number $i!").toDF("name_b")
    val joined = Relational.fuzzyJoinSegmented(l, r, "name_a", "name_b", 3)
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    // exactness against the brute-force join on the same predicate
    val expected = l.crossJoin(r)
      .filter(levenshtein(col("name_a"), col("name_b")) <= 3).count()
    assert(joined.count() == expected)
  }
}
