package graft

import graft.ingest.Ingest
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants for identity resolution, sessionization,
  * and dedup clustering — for ANY random input:
  *
  *  resolveIdentities: ids are unique; existing keys keep their ids;
  *    new ids are exactly max(existing)+1 .. max(existing)+|new keys|
  *    (the reference's monotonic next_id counter, gap-free);
  *  sessionize: session_seq starts at 1 per user, never jumps by more
  *    than 1 in time order, and increments exactly where the gap rule
  *    fires;
  *  dupClusters: labels are a fixpoint (re-clustering the induced
  *    same-label pairs changes nothing), every label is the minimum id
  *    of its component, and both the union-find and distributed paths
  *    agree.
  *
  * (Raw ScalaCheck Gen sampling with a fixed seed — the scalatestplus
  * bridge isn't available offline.)
  */
class IngestPropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: rng.Seed): A =
    g.apply(Gen.Parameters.default, seed).getOrElse(sys.error("gen failed"))

  test("resolveIdentities: unique, stable, gap-free monotonic ids") {
    import spark.implicits._
    val rawGen = Gen.listOfN(30, for {
      k <- Gen.choose(1, 12).map(i => s"k$i")
      seq <- Gen.choose(0L, 1000L)
    } yield (k, seq))
    val existingGen = for {
      n <- Gen.choose(0, 5)
      ks <- Gen.pick(n, (1 to 12).map(i => s"k$i"))
    } yield ks.toSeq.sorted.zipWithIndex.map { case (k, i) => (k, (i + 1).toLong) }

    var seed = rng.Seed(7L)
    (1 to 6).foreach { _ =>
      val raw = sample(rawGen, seed); seed = seed.next
      val existing = sample(existingGen, seed); seed = seed.next
      val m = Ingest.resolveIdentities(
        raw.toDF("user_key", "seq"), existing.toDF("user_key", "id"))
        .collect().map(r => r.getString(0) -> r.getLong(1))

      assert(m.map(_._2).distinct.length == m.length, "ids must be unique")
      existing.foreach { case (k, id) =>
        assert(m.toMap.get(k).contains(id), s"existing $k must keep id $id")
      }
      val maxExisting = existing.map(_._2).maxOption.getOrElse(0L)
      val newIds = m.filter(p => !existing.exists(_._1 == p._1)).map(_._2).sorted.toSeq
      assert(newIds == (maxExisting + 1 to maxExisting + newIds.length).toSeq,
        "new ids must be gap-free from max(existing)+1")
    }
  }

  test("sessionize: 1-based, unit-increment, gap-exact session numbering") {
    import spark.implicits._
    val gap = 100L
    val evGen = Gen.listOfN(40, for {
      u <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 2000L)
    } yield (u, ts))

    var seed = rng.Seed(11L)
    (1 to 6).foreach { _ =>
      val ev = sample(evGen, seed).distinct; seed = seed.next
      val out = Ingest.sessionize(ev.toDF("user_id", "ts_us"), "user_id", "ts_us", gap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.groupBy(_._1).foreach { case (_, rows) =>
        val inOrder = rows.sortBy(_._2)
        assert(inOrder.head._3 == 1L, "first session is 1")
        inOrder.sliding(2).foreach {
          case Array((_, t0, s0), (_, t1, s1)) =>
            val expected = if (t1 - t0 > gap) s0 + 1 else s0
            assert(s1 == expected,
              s"gap rule: ts $t0->$t1 (gap ${t1 - t0}) must map session $s0->$expected, got $s1")
          case _ =>
        }
      }
    }
  }

  test("dupClusters: fixpoint labels, component-minimum, paths agree") {
    import spark.implicits._
    val pairGen = Gen.listOfN(15, for {
      a <- Gen.choose(1L, 12L)
      b <- Gen.choose(1L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b)))

    // 3 rounds: each distributed-path run costs ~10 Spark jobs, and
    // the invariants are per-graph, not per-round
    var seed = rng.Seed(23L)
    (1 to 3).foreach { _ =>
      val pairs = sample(pairGen, seed).distinct; seed = seed.next
      if (pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b")
        val uf = Dedup.dupClusters(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val dist = Dedup.dupClusters(df, smallGraphEdges = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(uf == dist, "union-find and distributed propagation must agree")
        // every edge's endpoints share a label; label = min of its group
        pairs.foreach { case (a, b) =>
          assert(uf(a) == uf(b), s"pair ($a,$b) must share a cluster")
        }
        uf.groupBy(_._2).foreach { case (lbl, members) =>
          assert(lbl == members.keys.min, "cluster id must be the minimum member id")
        }
        // fixpoint: clustering the induced same-label pairs reproduces labels
        val induced = uf.groupBy(_._2).values.filter(_.size > 1).flatMap { ms =>
          val ids = ms.keys.toSeq.sorted
          ids.tail.map(x => (ids.head, x))
        }.toSeq
        if (induced.nonEmpty) {
          val again = Dedup.dupClusters(induced.toDF("id_a", "id_b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(again == uf.filter { case (id, _) => again.contains(id) },
            "labels must be a fixpoint")
        }
      }
    }
  }
}
