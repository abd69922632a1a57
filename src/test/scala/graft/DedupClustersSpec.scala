package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Label-propagation connected components vs an independent union-find
  * model, plus the multi-round and degenerate cases. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Independent model: path-compressed union-find. */
  private def unionFind(ids: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("chains, stars, merges, and singletons label to the component minimum") {
    import spark.implicits._
    val ids = (0L to 9L)
    // chain 0-1-2-3 needs >1 propagation round; 5-6-7 star; 4/8/9 singletons
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (5L, 7L))
    val got = Dedup.connectedComponents(
      ids.toDF("id"), edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(ids, edges))
    // joining two components through a late edge also converges
    val merged = Dedup.connectedComponents(
      ids.toDF("id"), (edges :+ (3L, 5L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === unionFind(ids, edges :+ (3L, 5L)))
    assert(merged(7L) === 0L, "merged chain+star must label to the global min")
  }

  test("no edges: every vertex is its own cluster, one round") {
    import spark.implicits._
    val got = Dedup.connectedComponents(
      (0L to 4L).toDF("id"), Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 4L).map(i => i -> i).toMap)
  }

  test("dedup_clusters matches union-find over the engine's own pair graph") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSeq
    val pairs = Dedup.shingleJaccardOn(docs)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs for this test")
    val model = unionFind(ids, pairs)
    val sizes = model.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val got = Dedup.clusters.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === ids.length)
    for ((doc, cid, csize) <- got) {
      assert(cid === model(doc), s"doc $doc cluster")
      assert(csize === sizes(model(doc)), s"doc $doc cluster size")
    }
  }
}
