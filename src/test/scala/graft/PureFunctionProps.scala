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

  // The codec contract multimodal_features' oracle leans on: the PNG
  // round-trip is LOSSLESS, so decode(encode(g)) recovers g exactly for
  // any dims and any 0-255 pattern.
  property("encodePng → ImageIO decode is pixel-exact for arbitrary patterns") =
    Prop.forAll(Gen.chooseNum(1, 24), Gen.chooseNum(1, 24),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (w, h, seed) =>
      def g(x: Int, y: Int): Int =
        (((seed * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodePng(w, h, g)))
      img.getWidth == w && img.getHeight == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          img.getRaster.getSample(x, y, 0) == g(x, y)))
    }

  // The minhash-multiplier invariant CLAUDE.md records: small multipliers
  // correlate the k argmins and blow up LSH candidates ~13×. Every a_j must
  // be odd, land in [2^29, 2^30) (large, and a_j·h < 2^62 overflow-free),
  // and the slots must be pairwise distinct.
  property("minhashA: odd, in [2^29, 2^30), pairwise distinct") =
    Prop.forAll(Gen.chooseNum(0, 63)) { j =>
      val a = graft.ops.Dedup.minhashA(j)
      a % 2 == 1 && a >= (1L << 29) && a < (1L << 30)
    } && Prop {
      val vals = (0 until 64).map(graft.ops.Dedup.minhashA)
      vals.distinct.length == vals.length
    }

  property("minhashB: non-negative, below the modulus") =
    Prop.forAll(Gen.chooseNum(0, 63)) { j =>
      val b = graft.ops.Dedup.minhashB(j)
      b >= 0 && b < graft.ops.Dedup.MinhashPrime
    }
}
