package graft.sketch

/** Thomas Wang's 64-bit invertible integer mix, parameterized by output
  * width `bits` (the hash is masked to `bits` after every widening step, so
  * the mix is a bijection on [0, 2^bits) for any 1 <= bits <= 64).
  *
  * Semantics match the reference's reversible hasher
  * (/root/reference/src/reversible_hasher.rs:54-65 forward, :16-51 inverse):
  * keys below 2^bits hash losslessly and `unhash(hash(k)) == k`, which is
  * what makes CQF enumeration able to recover original keys.
  */
object WangHash {

  /** (2^bits - 1) as a Long bitmask; bits >= 64 gives all ones. */
  @inline def mask(bits: Int): Long = if (bits >= 64) -1L else (1L << bits) - 1L

  // Multiplicative inverses of 21 and 265 modulo 2^64. Because the masked
  // multiply is just multiplication mod 2^bits, the mod-2^64 inverse also
  // inverts it mod 2^bits for any bits <= 64.
  private val Inv21 = 0xcf3cf3cf3cf3cf3dL  // 21^-1 mod 2^64
  private val Inv265 = 0xd38ff08b1c03dd39L // 265^-1 mod 2^64

  /** Forward mix of `key`, masked to `bits`. */
  def hash(key0: Long, bits: Int): Long = {
    val m = mask(bits)
    var key = key0
    key = (~key + (key << 21)) & m // key = (key << 21) - key - 1
    key = key ^ (key >>> 24)
    key = (key + (key << 3) + (key << 8)) & m // key * 265
    key = key ^ (key >>> 14)
    key = (key + (key << 2) + (key << 4)) & m // key * 21
    key = key ^ (key >>> 28)
    key = (key + (key << 31)) & m
    key
  }

  /** Exact inverse of [[hash]]: recovers the original key from its hash. */
  def unhash(h: Long, bits: Int): Long = {
    val m = mask(bits)
    var key = h
    var tmp = 0L
    // invert key = key + (key << 31)
    tmp = key - (key << 31)
    key = (key - (tmp << 31)) & m
    // invert key = key ^ (key >>> 28)
    tmp = key ^ (key >>> 28)
    key = key ^ (tmp >>> 28)
    // invert key *= 21
    key = (key * Inv21) & m
    // invert key = key ^ (key >>> 14)
    tmp = key ^ (key >>> 14)
    tmp = key ^ (tmp >>> 14)
    tmp = key ^ (tmp >>> 14)
    key = key ^ (tmp >>> 14)
    // invert key *= 265
    key = (key * Inv265) & m
    // invert key = key ^ (key >>> 24)
    tmp = key ^ (key >>> 24)
    key = key ^ (tmp >>> 24)
    // invert key = ~key + (key << 21)
    tmp = ~key
    tmp = ~(key - (tmp << 21))
    tmp = ~(key - (tmp << 21))
    key = (~(key - (tmp << 21))) & m
    key
  }

  /** [[hash]]/[[unhash]] behind the [1, 64] bits guard — the codegen
    * entry points: whole-stage-generated Java calls these static
    * forwarders directly (one invokestatic, JIT-inlineable), so the
    * validation and the arithmetic are identical between the interpreted
    * and compiled paths of WangHashExpr/WangUnhashExpr. */
  def hashChecked(key: Long, bits: Int, name: String): Long = {
    require(bits >= 1 && bits <= 64, s"$name: bits must be in [1, 64], got $bits")
    hash(key, bits)
  }

  def unhashChecked(key: Long, bits: Int, name: String): Long = {
    require(bits >= 1 && bits <= 64, s"$name: bits must be in [1, 64], got $bits")
    unhash(key, bits)
  }

  /** A well-scrambled (non-maskable) 64-bit mix for the sibling sketches
    * (HLL/CMS/Bloom) where invertibility is not needed but avalanche is.
    * This is the classic murmur3-style finalizer with an additive seed.
    */
  def mix64(key0: Long, seed: Long): Long = {
    var h = key0 + seed
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** mix64 over UTF-8 bytes of a string (simple but solid: fold 8 bytes at
    * a time through mix64). */
  def mixBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ (bytes.length.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i + 8 <= bytes.length) {
      var w = 0L
      var j = 0
      while (j < 8) { w = (w << 8) | (bytes(i + j) & 0xffL); j += 1 }
      h = mix64(h ^ w, 0x2545f4914f6cdd1dL)
      i += 8
    }
    var tail = 0L
    while (i < bytes.length) { tail = (tail << 8) | (bytes(i) & 0xffL); i += 1 }
    mix64(h ^ tail, 0x452821e638d01377L)
  }
}
