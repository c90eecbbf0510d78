package graft.gen

/** Bit-exact Scala port of the reference's seeded PRNG utilities
  * (reference: src/utils.ts:40-69): Mulberry32 over int32 semantics, the
  * 62-char alphabet `randomString`, and `generateRandomStrings` used to build
  * deterministic enum vocabularies (default seed 1).
  *
  * JS semantics notes: the JS closure keeps `seed` as a float64 that grows by
  * 0x6D2B79F5 per call and is only coerced to int32 at use (`ToInt32`), so we
  * track the accumulated seed in a Long and truncate per call. `Math.imul` is
  * exactly 32-bit `Int` multiplication; `>>>` matches Scala's `Int` `>>>` at
  * the bit level; JS float addition of two int32s coerced back via `ToInt32`
  * equals wrapping `Int` addition.
  */
final class Mulberry32(seed: Long = 1L) {
  private var state: Long = seed

  /** Next uniform double in [0, 1). */
  def next(): Double = {
    state += 0x6d2b79f5L
    var t: Int = state.toInt // ToInt32 of the accumulated float64
    t = (t ^ (t >>> 15)) * (t | 1)
    t = t ^ (t + ((t ^ (t >>> 7)) * (t | 61)))
    ((t ^ (t >>> 14)).toLong & 0xffffffffL).toDouble / 4294967296.0
  }
}

object Rng {
  val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  /** One deterministic random string (reference: src/utils.ts:51-60). */
  def randomString(rng: Mulberry32, length: Int): String = {
    val sb = new StringBuilder(length)
    var i = 0
    while (i < length) {
      sb.append(Alphabet.charAt(math.floor(rng.next() * Alphabet.length).toInt))
      i += 1
    }
    sb.toString
  }

  /** Deterministic enum vocabulary (reference: src/utils.ts:62-69). */
  def generateRandomStrings(count: Int, length: Int, seed: Long = 1L): Seq[String] = {
    val rng = new Mulberry32(seed)
    Seq.fill(count)(randomString(rng, length))
  }
}
