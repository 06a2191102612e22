package graft

import org.apache.spark.sql.functions._
import graft.ext.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toDF("src", "dst")

  test("pageRankInt: total mass is conserved up to the documented floor-division leak") {
    // directed 4-cycle: perfectly symmetric, every vertex ends equal
    val e = edges((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got = Graphs.pageRankInt(e, iters = 5, scale = 1000000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).distinct.length == 1, got.toList) // symmetry
    val total = got.map(_._2).sum
    // leak bound: per vertex per round ≤ (outdeg + 1) units
    assert(total <= 1000000L && total >= 1000000L - 5 * 4 * 2, total)
  }

  test("pageRankInt: a sink-of-attention vertex outranks the periphery") {
    // 0,1,2,3 all point at 4; 4 points back at 0 only. The 0↔4 2-cycle
    // oscillates with amplitude ∝ 0.85^k — 40 rounds damp it well below
    // the 4% steady-state gap between v4 (0.4757) and v0 (0.4343)
    val e = edges((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 0L))
    val m = Graphs.pageRankInt(e, iters = 40).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(4L) > m(0L) && m(0L) > m(1L), m) // 4 top, 0 (4's target) next
    assert(m(1L) == m(2L) && m(2L) == m(3L), m) // symmetric periphery
  }

  test("pageRankInt is deterministic across independent runs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val e = Graphs.syntheticEdges(docs, "doc_id")
    val a = Graphs.pageRankInt(e, 3).orderBy("id").collect().toSeq
    val b = Graphs.pageRankInt(e, 3).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("labelPropagation converges to component minima once rounds reach the diameter") {
    // two components: a path 0-1-2-3 (diameter 3) and an isolated pair 8-9
    val e = edges((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L))
    val got = Graphs.labelPropagation(e, iters = 3).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 8L -> 8L, 9L -> 8L), got)
  }

  test("labelPropagation intermediate state: labels travel at most `iters` hops") {
    // a long path: after 2 rounds vertex 5 can only see down to id 3
    val e = edges((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = Graphs.labelPropagation(e, iters = 2).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 3L && got(2L) == 0L, got)
  }

  test("triangleCounts: K4 has four triangles, three per corner; a square has none") {
    val k4 = edges((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val got = Graphs.triangleCounts(k4).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)), got)
    val square = edges((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(Graphs.triangleCounts(square).count() == 0L)
  }

  test("triangleCounts ignores edge direction, self-loops, and parallel duplicates") {
    val messy = edges((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 0L), (2L, 0L))
    val got = Graphs.triangleCounts(messy).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((0L, 1L), (1L, 1L), (2L, 1L)), got)
  }

  test("ringEdges guarantee a triangle per vertex at any corpus size") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val n = docs.count()
    val tri = Graphs.triangleCounts(Graphs.ringEdges(docs, "doc_id"))
    assert(tri.count() == n) // every vertex corners ≥ 1 triangle
  }
}
