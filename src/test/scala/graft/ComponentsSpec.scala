package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCensus: triangle + pendant graph counts exactly") {
    // triangle {1,2,3} plus pendant 3-4: T=1, degrees (1,1)=2 (2)=2 (3)=3 (4)=1
    // wedges = 1+1+3+0 = 5, clustering = 3*1/5
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("da", "db")
    val out = Components.triangleCensus(e, "da", "db")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((4L, 4L, 5L, 1L, 3.0 / 5.0)))
    // two triangles sharing edge (1,2): T=2, degrees 3,3,2,2 -> wedges 3+3+1+1=8
    val e2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)).toDF("da", "db")
    val out2 = Components.triangleCensus(e2, "da", "db")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out2 == Seq((4L, 5L, 8L, 2L, 6.0 / 8.0)))
  }

  private def bfsComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        var frontier = List(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap { v =>
            if (label.contains(v)) Nil else { label(v) = start; adj(v) }
          }
          frontier = next
        }
      }
    }
    label.toMap
  }

  test("connected agrees with brute-force BFS on random graphs (both paths)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val nV = 2 + rnd.nextInt(30)
      val nE = 1 + rnd.nextInt(40)
      val edges = Seq.fill(nE)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val expected = bfsComponents(edges)
      // distributed path is slow per-run; exercise it on a subset
      val caps = if (trial < 2) Seq(Long.MaxValue, 0L) else Seq(Long.MaxValue)
      for (cap <- caps) {
        val got = Components.connected(edges.toDF("a", "b"), "a", "b",
          driverSolveMaxEdges = cap).as[(Long, Long)].collect().toMap
        assert(got === expected, s"trial=$trial cap=$cap edges=$edges")
      }
    }
  }

  // driverSolveMaxEdges = 0 forces the distributed propagation path;
  // the default exercises driver union-find — both must agree.
  for ((mode, cap) <- Seq(("driver", Long.MaxValue), ("distributed", 0L))) {
    test(s"connected ($mode): two components, min id wins") {
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      val got = Components.connected(edges, "a", "b", driverSolveMaxEdges = cap)
        .orderBy($"v").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    }

    test(s"connected ($mode): long path converges") {
      // a 64-node path: 1-hop propagation needs 63 rounds; with path
      // doubling maxIter=10 must suffice (log2(64)=6 + slack)
      val n = 64
      val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
      val labels = Components.connected(edges, "a", "b", maxIter = 10,
        driverSolveMaxEdges = cap)
      assert(labels.select(countDistinct($"component")).head.getLong(0) === 1L)
      assert(labels.agg(max($"component")).head.getLong(0) === 0L)
      assert(labels.count() === n.toLong)
    }

    test(s"connected ($mode): empty edge frame yields an empty result") {
      val empty = Seq.empty[(Long, Long)].toDF("a", "b")
      assert(Components.connected(empty, "a", "b",
        driverSolveMaxEdges = cap).count() == 0L)
    }

    test(s"connected ($mode): duplicate and reversed edges are harmless") {
      val edges = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L)).toDF("a", "b")
      val got = Components.connected(edges, "a", "b", driverSolveMaxEdges = cap)
        .orderBy($"v").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    }
  }
}
