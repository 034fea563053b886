package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

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

    test(s"connected ($mode): duplicate and reversed edges are harmless") {
      val edges = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L)).toDF("a", "b")
      val got = Components.connected(edges, "a", "b", driverSolveMaxEdges = cap)
        .orderBy($"v").as[(Long, Long)].collect().toSeq
      assert(got === Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    }
  }
}
