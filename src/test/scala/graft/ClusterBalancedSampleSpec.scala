package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ApproxAndSample

/** `sample_cluster_balanced` against a from-first-principles Scala model
  * on a synthetic frame: md5-ranked centroid pick, cosine-argmax
  * assignment (max csim, then min cid — `withCentroidScores`' struct
  * tie-break), md5-ASC per-cluster pick. Plus the operator's POINT: the
  * budget flattens the cluster histogram — head clusters emit exactly
  * `perCluster` rows, tail clusters survive whole. */
class ClusterBalancedSampleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("matches the model and flattens the histogram") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sqrt => ssqrt}
    // 40 vectors in a head direction, 3 in a tail direction, distinct
    // norms so cosine ties are broken by geometry not luck
    val vecs: Seq[(Long, Seq[Double])] =
      (0L until 40L).map(i => i -> Seq(10.0 + i, 1.0 + (i % 7), 0.0)) ++
        Seq(100L -> Seq(0.1, 0.2, 9.0), 101L -> Seq(0.3, 0.1, 8.0),
          102L -> Seq(0.2, 0.2, 7.5))
    val n = vecs.toDF("vec_id", "e")
      .withColumn("nrm", ssqrt(graft.functions.VectorFunctions
        .dotProduct(col("e"), col("e"))))
    // with THESE vec_ids the md5-ranked centroids split the corpus into
    // clusters of 6 and 37 (deterministic — md5 never changes); 6 per
    // cluster makes one survive whole and one get downsampled
    val perCluster = 6
    val numCents = 2

    // ---- model ----
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(x => x._1 * x._2).sum
    def nrm(a: Seq[Double]) = math.sqrt(dot(a, a))
    val cents = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(numCents)
    val assign = vecs.map { case (id, e) =>
      val best = cents.map { case (cid, ce) =>
        (dot(e, ce) / (nrm(e) * nrm(ce)), cid)
      }.maxBy { case (csim, cid) => (csim, -cid) } // max csim, min cid
      id -> best._2
    }.toMap
    val byCluster = assign.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    val expected = byCluster.toSeq.flatMap { case (cid, members) =>
      val picked = members.sortBy(id => (md5hex(id.toString).take(15), id))
        .take(perCluster)
      picked.zipWithIndex.map { case (id, i) =>
        (cid, id, (i + 1).toLong, members.size.toLong) }
    }.sortBy(x => (x._1, x._3))

    // ---- engine ----
    val got = ApproxAndSample.clusterBalancedOn(n, numCents, perCluster)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(got === expected, s"got $got\nexpected $expected")

    // the point: per-cluster output is min(cluster_n, perCluster)
    for ((cid, rows) <- got.groupBy(_._1)) {
      val clusterN = rows.head._4
      assert(rows.length === math.min(clusterN, perCluster.toLong).toInt,
        s"budget for cluster $cid")
      assert(rows.map(_._3).sorted === (1L to rows.length).toSeq,
        s"contiguous picks for cluster $cid")
    }
    // fixture sanity: at least one cluster was genuinely downsampled and
    // at least one survived whole, or the test proves nothing
    val sizes = got.groupBy(_._1).values.map(r => (r.head._4, r.length)).toSeq
    assert(sizes.exists { case (n0, k) => n0 > k },
      s"a head cluster must be downsampled: $sizes")
    assert(sizes.exists { case (n0, k) => n0 == k },
      s"a tail cluster must survive whole: $sizes")
  }
}
