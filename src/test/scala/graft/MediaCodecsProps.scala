package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops._

/** Round-trip and totality properties for the pure-JVM codecs: encode
  * then decode must reproduce the payload byte-for-byte over arbitrary
  * content (JVM-local — no Spark session needed), and decode must never
  * throw on arbitrary garbage.
  */
object MediaCodecsProps extends Properties("MediaCodecs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val genSamples: Gen[Array[Short]] =
    Gen.containerOf[Array, Short](Gen.chooseNum(Short.MinValue, Short.MaxValue))

  property("wav round-trips arbitrary samples, rates and channel counts") =
    forAll(genSamples, Gen.choose(1, 192000), Gen.choose(1, 8)) {
      (samples, rate, channels) =>
        WavCodec.decode(WavCodec.encode(samples, rate, channels)) match {
          case Some(DecodedAudio(r, c, got)) =>
            r == rate && c == channels && got.toSeq == samples.toSeq
          case _ => false
        }
    }

  private val genImage: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 9) // widths 1-9 exercise every stride-padding case
    h <- Gen.choose(1, 9)
    px <- Gen.containerOfN[Array, Byte](w * h * 3, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px)

  property("bmp round-trips arbitrary pixels across stride paddings") =
    forAll(genImage) { case (w, h, px) =>
      BmpCodec.decode(BmpCodec.encode(w, h, px)) match {
        case Some(DecodedImage(gw, gh, 3, got)) =>
          gw == w && gh == h && got.toSeq == px.toSeq
        case _ => false
      }
    }

  private val genGarbage: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))

  property("decode is total on arbitrary garbage (None or Some, never a throw)") =
    forAll(genGarbage) { bytes =>
      MediaCodecs.decode(bytes)
      true // reaching here means no exception escaped
    }

  // mutate real payloads: truncations of valid encodings never throw
  property("decode is total on truncated valid payloads") =
    forAll(genSamples, Gen.choose(0, 60)) { (samples, cut) =>
      val wav = WavCodec.encode(samples, 8000, 1)
      WavCodec.decode(wav.take(math.min(cut, wav.length)))
      true
    }
}
