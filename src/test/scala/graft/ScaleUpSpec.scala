package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-fixture generator's perturbation keys: the cross-replica
  * collision bound must hold for every replica pair at the sf10
  * factor, or the scaling measurement silently reintroduces quadratic
  * duplicate mass.
  */
class ScaleUpSpec extends AnyFunSuite {
  test("buildPerms(100): identity first, all bijections, pairwise agreement <= 2") {
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val perms = graft.tools.ScaleUp.buildPerms(100)
    assert(perms.size === 100)
    assert(perms.head === alpha, "replica 0 must be the identity")
    perms.foreach(p => assert(p.sorted === alpha.sorted, s"not a bijection: $p"))
    for (i <- perms.indices; j <- 0 until i) {
      val agree = alpha.indices.count(k => perms(i)(k) == perms(j)(k))
      assert(agree <= 2, s"perms $j/$i agree on $agree chars")
    }
  }

  test("buildPerms is deterministic") {
    assert(graft.tools.ScaleUp.buildPerms(20) === graft.tools.ScaleUp.buildPerms(20))
  }
}
