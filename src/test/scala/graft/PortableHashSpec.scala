package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash

/** Pins the independence contract of the dedicated affine-hash
  * registry: every pipeline decision (split, sample, mix, shard,
  * sketch, fixture content, planted perturbations…) hashes through its
  * own (a, b), so no two decisions can be exactly correlated. This
  * spec exists because the contract was silently violated once —
  * [[PortableHash.VariantPixelPair]]'s original seed reused
  * [[PortableHash.WeightedSamplePair]]'s, making a variant image's
  * perturbed-pixel position identical to the same doc's
  * weighted-sample draw (see the scaladoc on VariantPixelPair). */
class PortableHashSpec extends AnyFunSuite {

  test("no two dedicated affine pairs share constants") {
    val dups = PortableHash.DedicatedPairs
      .groupBy(_._2).filter(_._2.size > 1).values.toSeq
    assert(dups.isEmpty,
      s"aliased pairs: ${dups.map(_.map(_._1).mkString("=")).mkString(", ")}")
  }

  test("no dedicated pair aliases a family member either") {
    val family = (PortableHash.MinhashFamily ++ PortableHash.SimhashFamily ++
      PortableHash.CmsFamily).toSet
    val hits = PortableHash.DedicatedPairs.filter(p => family.contains(p._2))
    assert(hits.isEmpty, s"pairs aliasing a family member: ${hits.map(_._1)}")
  }

  test("the registry names every dedicated pair exactly once") {
    val names = PortableHash.DedicatedPairs.map(_._1)
    assert(names.distinct.size === names.size)
  }
}
