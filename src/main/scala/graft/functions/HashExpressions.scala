package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Native Catalyst expressions for the dedup signature hot path.
  *
  * The higher-order-function formulations of MinHash and SimHash
  * (`transform(sequence(0,63), i -> array_min(transform(sh, s -> xxhash64(i,s))))`)
  * are semantically right but never enter whole-stage codegen: they evaluate
  * interpreted, re-walk the shingle array once per hash slot, and allocate an
  * intermediate array per slot per row. At corpus scale the signature stage is
  * the dominant CPU cost of near-dup detection, so — like
  * [[VectorExpressions.DotProduct]] — these get `doGenCode` implementations
  * that compile to tight primitive loops.
  *
  * [[MinHashSignature]] additionally switches to two-level hashing: one
  * xxhash64 pass over each shingle's bytes, then `numHashes` cheap
  * avalanche mixes (`XXH64.hashLong(base, slot)`) instead of `numHashes`
  * full byte passes. The hash family changes (signatures are not bit-equal to
  * the HOF formulation) but remains a proper MinHash — per-slot values are
  * uniform and independent across slots — so Jaccard estimation quality is
  * unchanged; OperatorsSpec verifies recall/estimate bounds against
  * brute-force Jaccard, not stored signature bits.
  *
  * [[SimHash64]] is bit-identical to the HOF formulation it replaces
  * (same `xxhash64(token)` base hash, same sign rule), so existing
  * fingerprints remain valid.
  */
object HashExpressions {

  private val Xxh64DefaultSeed = 42L // Spark's xxhash64(...) seed

  private def requireStringArray(dt: DataType, who: String): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$who expects array<string>, got $other")
    }

  /** MinHash signature of a string-array column: `numHashes` longs, slot `i`
    * = min over the array of `XXH64.hashLong(xxhash64(elem), i)`. One byte
    * pass per element + `numHashes` integer mixes; null elements are skipped;
    * an empty (or all-null) array yields NULL. */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with Serializable {
    require(numHashes > 0, "numHashes must be positive")

    // NULL is produced for empty/all-null arrays even when the child is
    // non-nullable, so nullability must not be inherited from the child
    // (inheriting it makes codegen emit `false = true;` for ev.isNull).
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "minhash_signature")

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val mins = new Array[Long](numHashes)
      java.util.Arrays.fill(mins, Long.MaxValue)
      var seen = false
      var s = 0
      while (s < n) {
        if (!a.isNullAt(s)) {
          seen = true
          val base = XXH64.hashUTF8String(a.getUTF8String(s), Xxh64DefaultSeed)
          var i = 0
          while (i < numHashes) {
            val h = XXH64.hashLong(base, i)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
        s += 1
      }
      if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val mins = ctx.freshName("mins")
        val base = ctx.freshName("base")
        val h = ctx.freshName("h")
        val seen = ctx.freshName("seen")
        s"""
           |int $n = $a.numElements();
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |boolean $seen = false;
           |for (int $s = 0; $s < $n; $s++) {
           |  if (!$a.isNullAt($s)) {
           |    $seen = true;
           |    long $base = $xxh.hashUTF8String($a.getUTF8String($s), ${Xxh64DefaultSeed}L);
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      long $h = $xxh.hashLong($base, (long) $i);
           |      if ($h < $mins[$i]) $mins[$i] = $h;
           |    }
           |  }
           |}
           |if (!$seen) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $uad.fromPrimitiveArray($mins);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fraction of agreeing slots between two long-array signatures:
    * `|{i : a[i] == b[i]}| / |a|`, compared over the common prefix. The
    * scalar equivalent of `size(filter(zip_with(a,b,_===_), identity))/size(a)`
    * without the two intermediate arrays. */
  case class SignatureAgreement(left: Expression, right: Expression)
      extends BinaryExpression with Serializable {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"signature_agreement expects two array<bigint>, got $l and $r")
      }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0) return 0.0d
      val m = math.min(n, b.numElements())
      var agree = 0
      var i = 0
      while (i < m) {
        if (a.getLong(i) == b.getLong(i)) agree += 1
        i += 1
      }
      agree.toDouble / n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        val i = ctx.freshName("i")
        val agree = ctx.freshName("agree")
        s"""
           |int $n = $a.numElements();
           |int $m = java.lang.Math.min($n, $b.numElements());
           |int $agree = 0;
           |for (int $i = 0; $i < $m; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
           |}
           |${ev.value} = $n == 0 ? 0.0 : (double) $agree / (double) $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash of a string-array column: bit `j` of the result is set
    * iff `sum over tokens of sign((xxhash64(token) >> j) & 1)` is strictly
    * positive — bit-identical to the HOF formulation in earlier revisions.
    * Null tokens are skipped; an empty array hashes to 0. */
  case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "simhash64")

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val counters = new Array[Int](64)
      var s = 0
      while (s < n) {
        if (!a.isNullAt(s)) {
          val h = XXH64.hashUTF8String(a.getUTF8String(s), Xxh64DefaultSeed)
          var j = 0
          while (j < 64) {
            counters(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
        s += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (counters(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val counters = ctx.freshName("counters")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = $a.numElements();
           |int[] $counters = new int[64];
           |for (int $s = 0; $s < $n; $s++) {
           |  if (!$a.isNullAt($s)) {
           |    long $h = $xxh.hashUTF8String($a.getUTF8String($s), ${Xxh64DefaultSeed}L);
           |    for (int $j = 0; $j < 64; $j++) {
           |      $counters[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $sig = 0L;
           |for (int $j = 0; $j < 64; $j++) {
           |  if ($counters[$j] > 0) $sig |= (1L << $j);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fused word-shingling + MinHash: the signature of the set of `shingleLen`-
    * word shingles of a token array, without materializing shingle strings or
    * a distinct set (the min over a multiset equals the min over its distinct
    * set, so dedup is unnecessary for MinHash). If the array is shorter than
    * `shingleLen`, the single shingle is all tokens joined. NULL for an empty
    * array. Same hash family as [[MinHashSignature]].
    *
    * Codegen emits a call to [[compute]] via a bound reference — the
    * shingling loop itself is precompiled Scala, and the surrounding
    * projection stays inside whole-stage codegen (an interpreted HOF here
    * would drag the entire projection out of codegen). */
  case class MinHashShingles(child: Expression, shingleLen: Int, numHashes: Int)
      extends UnaryExpression with Serializable {
    require(shingleLen > 0 && numHashes > 0, "need positive shingleLen/numHashes")

    // empty array → NULL regardless of child nullability (see MinHashSignature)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "minhash_shingles")

    def compute(v: ArrayData): ArrayData = {
      val a = v
      val n = a.numElements()
      if (n == 0) return null
      val mins = new Array[Long](numHashes)
      java.util.Arrays.fill(mins, Long.MaxValue)
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      def add(s: org.apache.spark.unsafe.types.UTF8String): Unit = {
        val base = XXH64.hashUTF8String(s, Xxh64DefaultSeed)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(base, i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      if (n < shingleLen) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = a.getUTF8String(k); k += 1 }
        add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      } else {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleLen)
        var s = 0
        while (s + shingleLen <= n) {
          var k = 0
          while (k < shingleLen) { parts(k) = a.getUTF8String(s + k); k += 1 }
          add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
          s += 1
        }
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashShingles", this, classOf[MinHashShingles].getName)
      val ad = classOf[ArrayData].getName
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |$ad ${ev.value}_r = $self.compute($a);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct sorted xxhash64 values of the `shingleLen`-word shingles of a
    * token array — the inverted-index key stream for exact n-gram Jaccard,
    * which only ever joins and counts on the 64-bit shingle hash (never the
    * string), so the strings are never materialized into the plan. Same
    * short-array / empty-array semantics as [[MinHashShingles]]. */
  case class ShingleHashes(child: Expression, shingleLen: Int)
      extends UnaryExpression with Serializable {
    require(shingleLen > 0, "need positive shingleLen")

    // empty array → NULL regardless of child nullability (see MinHashSignature)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "shingle_hashes")

    def compute(v: ArrayData): ArrayData = {
      val a = v
      val n = a.numElements()
      if (n == 0) return null
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val hs: Array[Long] =
        if (n < shingleLen) {
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
          var k = 0
          while (k < n) { parts(k) = a.getUTF8String(k); k += 1 }
          Array(XXH64.hashUTF8String(
            org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), Xxh64DefaultSeed))
        } else {
          val m = n - shingleLen + 1
          val out = new Array[Long](m)
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleLen)
          var s = 0
          while (s < m) {
            var k = 0
            while (k < shingleLen) { parts(k) = a.getUTF8String(s + k); k += 1 }
            out(s) = XXH64.hashUTF8String(
              org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), Xxh64DefaultSeed)
            s += 1
          }
          out
        }
      java.util.Arrays.sort(hs)
      var uniq = 0
      var i = 0
      while (i < hs.length) {
        if (i == 0 || hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, uniq))
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
      val ad = classOf[ArrayData].getName
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |$ad ${ev.value}_r = $self.compute($a);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Intra-document repetition statistics over the (non-distinct) stream of
    * `shingleLen`-word shingles of a token array: struct(n_shingles,
    * n_distinct, max_freq) — the inputs for Gopher-style repetition filters
    * (duplicate-n-gram fraction, dominant-n-gram share). One hash pass, one
    * in-place sort, one run-length scan per row; no arrays of strings in the
    * plan. Short arrays (< shingleLen tokens) form one whole-text shingle,
    * matching [[ShingleHashes]]; empty arrays yield NULL. */
  case class ShingleDupStats(child: Expression, shingleLen: Int)
      extends UnaryExpression with Serializable {
    require(shingleLen > 0, "need positive shingleLen")

    // empty array → NULL regardless of child nullability (see MinHashSignature)
    override def nullable: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_shingles", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n_distinct", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("max_freq", org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "shingle_dup_stats")

    def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
      val a = v
      val n = a.numElements()
      if (n == 0) return null
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val hs: Array[Long] =
        if (n < shingleLen) {
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
          var k = 0
          while (k < n) { parts(k) = a.getUTF8String(k); k += 1 }
          Array(XXH64.hashUTF8String(
            org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), Xxh64DefaultSeed))
        } else {
          val m = n - shingleLen + 1
          val out = new Array[Long](m)
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleLen)
          var s = 0
          while (s < m) {
            var k = 0
            while (k < shingleLen) { parts(k) = a.getUTF8String(s + k); k += 1 }
            out(s) = XXH64.hashUTF8String(
              org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), Xxh64DefaultSeed)
            s += 1
          }
          out
        }
      java.util.Arrays.sort(hs)
      var distinct = 0
      var maxFreq = 0
      var run = 0
      var i = 0
      while (i < hs.length) {
        if (i == 0 || hs(i) != hs(i - 1)) { distinct += 1; run = 1 }
        else run += 1
        if (run > maxFreq) maxFreq = run
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hs.length, distinct, maxFreq))
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleDupStats", this, classOf[ShingleDupStats].getName)
      val ir = classOf[org.apache.spark.sql.catalyst.InternalRow].getName
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |$ir ${ev.value}_r = $self.compute($a);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All `tables` random-hyperplane LSH bucket ids of a float/double vector
    * in one array pass: bucket `t` is the `planes`-bit sign pattern of the
    * vector's projections onto deterministic pseudo-random hyperplanes whose
    * components derive from xxhash64(table, plane, dim) mapped to [-1, 1) —
    * bit-identical to the HOF formulation it replaces (same hash chain
    * `hashInt(dim, hashInt(plane, hashInt(table, 42)))`, same left-to-right
    * summation), so existing LSH indexes stay valid. */
  case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int)
      extends UnaryExpression with Serializable {
    require(planes > 0 && planes <= 63 && tables > 0, "need 0<planes<64, tables>0")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.FloatType, _) |
             ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float|double>, got $other")
      }

    private lazy val isFloat = child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _                                                  => false
    }

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        val ht = XXH64.hashInt(t, Xxh64DefaultSeed)
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val hp = XXH64.hashInt(p, ht)
          var proj = 0.0d
          var i = 0
          while (i < n) {
            val comp = (XXH64.hashInt(i, hp) >>> 11).toDouble / 4503599627370496.0d - 1.0d
            val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
            proj += x * comp
            i += 1
          }
          if (proj >= 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val get = if (isFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val ht = ctx.freshName("ht")
        val hp = ctx.freshName("hp")
        val proj = ctx.freshName("proj")
        val bucket = ctx.freshName("bucket")
        val comp = ctx.freshName("comp")
        s"""
           |int $n = $a.numElements();
           |long[] $out = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $ht = $xxh.hashInt($t, ${Xxh64DefaultSeed}L);
           |  long $bucket = 0L;
           |  for (int $p = 0; $p < $planes; $p++) {
           |    long $hp = $xxh.hashInt($p, $ht);
           |    double $proj = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      double $comp = (double) ($xxh.hashInt($i, $hp) >>> 11) / 4503599627370496.0 - 1.0;
           |      $proj += (double) $a.$get($i) * $comp;
           |    }
           |    if ($proj >= 0) $bucket |= (1L << $p);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = $uad.fromPrimitiveArray($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003) over a string's
    * character `winLen`-grams, in one O(n) pass: position `i`'s hash is the
    * first 4 bytes of md5 of the UTF-8 encoding of chars [i, i+winLen) — BIT-
    * IDENTICAL to the portable HOF rule
    * `conv(substring(md5(to_binary(substr(s,i,winLen),'utf-8')),1,8),16,10)`
    * the q82 oracle replays in DuckDB — and every frame of `k` consecutive
    * positions selects its leftmost minimum (matching `array_position`'s
    * first-occurrence tie-break). Returns the distinct selected 1-indexed
    * character starts, ascending.
    *
    * The HOF formulation is O(n·k) with a k-element `slice` allocation plus
    * `array_min`/`array_position` re-scans per frame; this is a monotonic
    * deque (pop-while-strictly-greater keeps the EARLIEST index among equal
    * minima at the front, so the leftmost tie-break is preserved), one md5
    * per position, zero per-frame allocation. Strings shorter than `winLen`
    * chars yield NULL; `n < k` degenerates to one whole-string frame, same
    * as `slice` past the array end. Selected indices are non-decreasing
    * across frames (a frame drops only its leftmost position), so
    * consecutive dedup equals `array_distinct`. */
  case class WinnowStarts(child: Expression, winLen: Int, k: Int)
      extends UnaryExpression with Serializable {
    require(winLen > 0, "need positive winLen")
    require(k > 0, "need positive frame size k")

    // short strings yield NULL even when the child is non-nullable (see
    // MinHashSignature for why nullability must not be inherited)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"winnow_starts expects string, got $other")
      }

    def compute(v: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val bytes = v.getBytes
      val nBytes = bytes.length
      val numChars = v.numChars()
      if (numChars < winLen) return null
      // char-start byte offsets: windows are CHARACTER grams (substr
      // semantics in both engines), hashed over their UTF-8 bytes
      val offs = new Array[Int](numChars + 1)
      var b = 0
      var c = 0
      while (b < nBytes) {
        offs(c) = b
        b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      offs(c) = nBytes
      val n = numChars - winLen + 1
      val hs = new Array[Long](n)
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = new Array[Byte](16)
      var p = 0
      while (p < n) {
        md.reset()
        md.update(bytes, offs(p), offs(p + winLen) - offs(p))
        md.digest(digest, 0, 16)
        hs(p) = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        p += 1
      }
      val w = math.min(k, n) // frame width; n < k → one whole-string frame
      val deque = new Array[Int](n)
      var head = 0
      var tail = 0
      val sel = new Array[Int](n)
      var m = 0
      var j = 0
      while (j < n) {
        // strict > keeps the earliest index among equal minima up front
        while (tail > head && hs(deque(tail - 1)) > hs(j)) tail -= 1
        deque(tail) = j
        tail += 1
        if (j >= w - 1) {
          while (deque(head) < j - (w - 1)) head += 1
          val min = deque(head)
          if (m == 0 || sel(m - 1) != min) { sel(m) = min; m += 1 }
        }
        j += 1
      }
      val out = new Array[Int](m)
      var q = 0
      while (q < m) { out(q) = sel(q) + 1; q += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("winnowStarts", this, classOf[WinnowStarts].getName)
      val ad = classOf[ArrayData].getName
      nullSafeCodeGen(ctx, ev, s => {
        s"""
           |$ad ${ev.value}_r = $self.compute($s);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Mod-p content-defined selection over a string's character
    * `winLen`-grams in one O(n) pass: position `i` is selected iff the
    * md5-head hash of chars [i, i+winLen) (same rule as [[WinnowStarts]],
    * bit-identical to the `conv(substring(md5(..),1,8),16,10) % p = 0`
    * filter the q80/q81 oracles replay) is ≡ 0 (mod p). Returns the
    * selected 1-indexed character starts, ascending.
    *
    * The HOF formulation materializes ALL n stride-1 window strings
    * through posexplode and filters AFTER the explode — ~135M 20-char
    * UTF8Strings at 500k docs, most of the measured mod-p premium. Here
    * only the ~n/p selected positions ever leave the row. Strings shorter
    * than `winLen` chars yield NULL; a document with no selected window
    * yields an empty array. */
  case class ModPStarts(child: Expression, winLen: Int, p: Int)
      extends UnaryExpression with Serializable {
    require(winLen > 0, "need positive winLen")
    require(p > 0, "need positive modulus p")

    // short strings yield NULL even when the child is non-nullable (see
    // MinHashSignature for why nullability must not be inherited)
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"mod_p_starts expects string, got $other")
      }

    def compute(v: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
      val bytes = v.getBytes
      val nBytes = bytes.length
      val numChars = v.numChars()
      if (numChars < winLen) return null
      val offs = new Array[Int](numChars + 1)
      var b = 0
      var c = 0
      while (b < nBytes) {
        offs(c) = b
        b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      offs(c) = nBytes
      val n = numChars - winLen + 1
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = new Array[Byte](16)
      val sel = new Array[Int](n)
      var m = 0
      var i = 0
      while (i < n) {
        md.reset()
        md.update(bytes, offs(i), offs(i + winLen) - offs(i))
        md.digest(digest, 0, 16)
        val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        if (h % p == 0) { sel(m) = i + 1; m += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sel, m))
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("modPStarts", this, classOf[ModPStarts].getName)
      val ad = classOf[ArrayData].getName
      nullSafeCodeGen(ctx, ev, s => {
        s"""
           |$ad ${ev.value}_r = $self.compute($s);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** DEFLATE size of a string's UTF-8 bytes (level 6, default strategy) —
    * the compression-ratio quality signal: highly repetitive text (the
    * boilerplate/spam regime) compresses far below natural prose, so
    * `deflate_bytes / n_bytes` is a cheap scan-local filter feature
    * (standard in pretraining pipelines). Returns
    * struct(n_bytes, deflate_bytes); NULL for the empty string. Not
    * ANSI-replayable (no zlib in SQL) — spec-gated, like the native
    * approximate paths. One Deflater per row, ended deterministically;
    * cost is bounded by document bytes. */
  case class DeflateStats(child: Expression)
      extends UnaryExpression with Serializable {

    override def nullable: Boolean = true
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_bytes",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("deflate_bytes",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"deflate_stats expects string, got $other")
      }

    def compute(v: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.sql.catalyst.InternalRow = {
      val bytes = v.getBytes
      if (bytes.isEmpty) return null
      val d = new java.util.zip.Deflater(6)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](1024)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](bytes.length, total))
      } finally d.end()
    }

    override def nullSafeEval(v: Any): Any =
      compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("deflateStats", this, classOf[DeflateStats].getName)
      val ir = classOf[org.apache.spark.sql.catalyst.InternalRow].getName
      nullSafeCodeGen(ctx, ev, s => {
        s"""
           |$ir ${ev.value}_r = $self.compute($s);
           |if (${ev.value}_r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}_r; }
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Driver-side mirror of [[HyperplaneBuckets]] for one table — used to turn
    * a literal query vector into literal probe bucket ids (bit-identical to
    * the bucket ids the expression assigns to stored vectors). */
  def hyperplaneBucketLocal(v: Seq[Double], planes: Int, table: Int): Long = {
    val ht = XXH64.hashInt(table, Xxh64DefaultSeed)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val hp = XXH64.hashInt(p, ht)
      var proj = 0.0d
      var i = 0
      while (i < v.length) {
        val comp = (XXH64.hashInt(i, hp) >>> 11).toDouble / 4503599627370496.0d - 1.0d
        proj += v(i) * comp
        i += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Column API. */
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    GraftBridge.toColumn(MinHashSignature(GraftBridge.toExpression(shingles), numHashes))
  def signature_agreement(a: Column, b: Column): Column =
    GraftBridge.toColumn(SignatureAgreement(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
  def simhash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))
  def hyperplane_buckets(vec: Column, planes: Int, tables: Int): Column =
    GraftBridge.toColumn(HyperplaneBuckets(GraftBridge.toExpression(vec), planes, tables))
  def minhash_shingles(tokens: Column, shingleLen: Int, numHashes: Int): Column =
    GraftBridge.toColumn(MinHashShingles(GraftBridge.toExpression(tokens), shingleLen, numHashes))
  def shingle_hashes(tokens: Column, shingleLen: Int): Column =
    GraftBridge.toColumn(ShingleHashes(GraftBridge.toExpression(tokens), shingleLen))
  def shingle_dup_stats(tokens: Column, shingleLen: Int): Column =
    GraftBridge.toColumn(ShingleDupStats(GraftBridge.toExpression(tokens), shingleLen))
  def winnow_starts(s: Column, winLen: Int, k: Int): Column =
    GraftBridge.toColumn(WinnowStarts(GraftBridge.toExpression(s), winLen, k))
  def mod_p_starts(s: Column, winLen: Int, p: Int): Column =
    GraftBridge.toColumn(ModPStarts(GraftBridge.toExpression(s), winLen, p))
  def deflate_stats(s: Column): Column =
    GraftBridge.toColumn(DeflateStats(GraftBridge.toExpression(s)))

  /** Register as SQL functions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "signature_agreement", exprs => SignatureAgreement(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }
}
