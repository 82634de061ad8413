package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Multimodal

/** ScalaCheck properties for the engine's pure (driver-side) functions. */
object PureFunctionProps extends Properties("graft.pure") {

  property("sampleFrameIndices: bounded, sorted, in-range, deterministic") =
    Prop.forAll(Gen.chooseNum(1, 10000), Gen.chooseNum(1, 64)) { (n, target) =>
      val s = Multimodal.sampleFrameIndices(n, target)
      s.length <= target &&
        s.nonEmpty && s.head == 0 &&
        s == s.sorted && s.forall(i => i >= 0 && i < n) &&
        s == Multimodal.sampleFrameIndices(n, target)
    }

  property("sampleFrameIndices: covers everything when frames fit") =
    Prop.forAll(Gen.chooseNum(1, 64)) { target =>
      val n = target
      Multimodal.sampleFrameIndices(n, target) == (0 until n)
    }
}
