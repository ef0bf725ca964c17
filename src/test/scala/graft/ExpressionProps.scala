package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CharShingleUtil, MinHashUtil, PolyHashUtil, WordShingleUtil}

/**
 * Property tests pinning the custom expressions to independent reference
 * implementations (plain Scala folds over the definition), across random
 * inputs — the same definitions the DuckDB oracles reimplement in SQL.
 */
object ExpressionProps extends Properties("graft.expressions") {
  private val P = PolyHashUtil.P

  private def refHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c) % P)

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("polyHash matches the definitional fold") = forAll(text) { s =>
    PolyHashUtil.hash(UTF8String.fromString(s)) == refHash(s)
  }

  property("word shingle hashes equal hashes of the shingle strings") =
    forAll(Gen.listOf(word), Gen.choose(1, 4)) { (ws, n) =>
      val s = ws.mkString(" ")
      val got = WordShingleUtil.shingleHashes(UTF8String.fromString(s), n)
        .toLongArray().toSeq
      val words = s.split(" ").filter(_.nonEmpty).toSeq
      val expect =
        if (words.size < n) Seq.empty
        else words.sliding(n).map(g => refHash(g.mkString(" "))).toSeq
      got == expect
    }

  property("word-gram stats equal the groupBy-count definition") =
    forAll(Gen.listOf(Gen.oneOf("a", "ab", "b", "the", "xy")),
           Gen.oneOf(Gen.const(" "), Gen.const("\t"), Gen.const("  \n")),
           Gen.choose(1, 3)) { (ws, sep, n) =>
      val s = ws.mkString(sep)
      val got = graft.functions.WordGramStatsUtil
        .stats(UTF8String.fromString(s), n).toLongArray().toSeq
      val words = s.split("\\s+").filter(_.nonEmpty).toSeq
      val expect =
        if (words.size < n) Seq(0L, 0L, 0L)
        else {
          val counts = words.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size)
          Seq((words.size - n + 1).toLong, counts.size.toLong,
            counts.values.max.toLong)
        }
      got == expect
    }

  property("char shingle hashes equal hashes of the substrings") =
    forAll(text, Gen.choose(1, 6)) { (s, n) =>
      val got = CharShingleUtil.shingleHashes(UTF8String.fromString(s), n)
        .toLongArray().toSeq
      val expect =
        if (s.length < n) Seq.empty
        else (0 to s.length - n).map(i => refHash(s.substring(i, i + n)))
      got == expect
    }

  property("minhash signature equals per-family minimum") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, P - 1)), Gen.choose(1, 32)) { (hs, k) =>
      val got = MinHashUtil.signature(new GenericArrayData(hs.toArray), k)
        .toLongArray().toSeq
      val expect = (0 until k).map { j =>
        hs.map(h => (h * (2L * j + 1) + (12345L * j + 7)) % P).min
      }
      got == expect
    }

  property("simhash signature equals the per-bit majority-vote definition") =
    forAll(Gen.listOf(Gen.choose(0L, P - 1)), Gen.choose(1, 63)) { (hs, bits) =>
      val got = graft.functions.SimHashUtil.signature(new GenericArrayData(hs.toArray), bits)
      val expect = (0 until bits).map { b =>
        val votes = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << b else 0L
      }.sum
      got == expect
    }

  property("bounded top-k over random partition splits equals global sort-take") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(-5.0, 5.0))),
           Gen.choose(1, 8), Gen.choose(1, 5)) { (rows, k, nParts) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val agg = graft.functions.BoundedTopK(
        BoundReference(0, LongType, nullable = false),
        BoundReference(1, DoubleType, nullable = false), k)
      // partial buffers per partition (update path), then serialize ->
      // deserialize -> merge, as the exchange would
      val parts = rows.zipWithIndex.groupMap(_._2 % nParts)(_._1).values.toList
      val merged = parts
        .map(_.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
          agg.update(b, InternalRow(r._1, r._2))
        })
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.toSeq.map { r =>
          val ir = r.asInstanceOf[InternalRow]; (ir.getLong(0), ir.getDouble(1))
        }
      val expect = rows.sortBy(t => (-t._2, t._1)).take(k)
      got == expect
    }

  property("vector-sum over random partition splits equals elementwise fold") =
    forAll(Gen.choose(1, 6).flatMap(dim =>
             Gen.listOf(Gen.listOfN(dim, Gen.choose(-5.0, 5.0)))),
           Gen.choose(1, 5)) { (rows, nParts) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val agg = graft.functions.VectorSum(
        BoundReference(0, ArrayType(DoubleType, containsNull = false), nullable = true))
      // update per partition, then serialize -> deserialize -> merge, as
      // the exchange would
      // a partition with no rows for the group serializes its EMPTY (null)
      // buffer — the exchange path must round-trip it
      val parts = List.empty[List[Double]] ::
        rows.zipWithIndex.groupMap(_._2 % nParts)(_._1).values.toList
      val merged = parts
        .map(_.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(new GenericArrayData(v.toArray)))
        })
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = Option(agg.eval(merged))
        .map(_.asInstanceOf[GenericArrayData].toDoubleArray.toSeq)
      val expect =
        if (rows.isEmpty) None
        else Some(rows.transpose.map(_.sum).toSeq)
      // same adds in the same order per position -> exact equality modulo
      // merge order; compare with a tolerance to stay order-agnostic
      (got.isEmpty == expect.isEmpty) && got.zip(expect).forall { case (g, e) =>
        g.size == e.size && g.zip(e).forall { case (x, y) => math.abs(x - y) <= 1e-9 }
      }
    }

  property("count-by-key over random partition splits equals groupBy size") =
    forAll(Gen.listOf(Gen.choose(0, 12)), Gen.choose(1, 5)) { (keys, nParts) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.IntegerType
      val agg = graft.functions.CountByIntKey(
        BoundReference(0, IntegerType, nullable = false))
      // update per partition, then serialize -> deserialize -> merge, as
      // the partial/final aggregation exchange would
      val parts = List.empty[Int] ::
        keys.zipWithIndex.groupMap(_._2 % nParts)(_._1).values.toList
      val merged = parts
        .map(_.foldLeft(agg.createAggregationBuffer()) { (b, k) =>
          agg.update(b, InternalRow(k))
        })
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val m = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayBasedMapData]
      val got = m.keyArray.toIntArray().zip(m.valueArray.toLongArray()).toMap
      val expect = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == expect
    }

  property("sorted-merge jaccard equals set jaccard") =
    forAll(Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L))) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expr = graft.functions.JaccardSorted(null, null)
      val got = expr.nullSafeEvalPublic(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      val inter = sa.toSet.intersect(sb.toSet).size
      val union = sa.toSet.union(sb.toSet).size
      val expect = if (union == 0) 0.0 else inter.toDouble / union
      got == expect
    }

  property("foldKeyRuns emits one fold per contiguous key run, in order") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.choose(-100, 100)))) { rows =>
      // rows arrive key-contiguous after the engine's sort; group without
      // reordering to build the expected per-run folds
      val sorted = rows.sortBy(_._1)
      val got = graft.operators.Scans.foldKeyRuns[(Int, Int), Int, (Int, List[Int])](
        sorted.iterator, _._1, (0, Nil),
        { case ((k, acc), (key, v)) => (key, acc :+ v) }).toList
      val expect = sorted.foldLeft(List.empty[(Int, List[Int])]) {
        case (out, (k, v)) if out.nonEmpty && out.last._1 == k =>
          out.init :+ ((k, out.last._2 :+ v))
        case (out, (k, v)) => out :+ ((k, List(v)))
      }
      got == expect
    }

  property("early-abandoning jaccard filters identically to the exact one") =
    forAll(Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L)),
           Gen.oneOf(0.1, 0.25, 0.5, 0.8, 1.0)) { (a, b, t) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val (xa, xb) = (new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      val exact = graft.functions.JaccardSorted(null, null)
        .nullSafeEvalPublic(xa, xb).asInstanceOf[Double]
      val gated = graft.functions.JaccardSortedAtLeast(null, null, t)
        .nullSafeEvalPublic(xa, xb).asInstanceOf[Double]
      // the gate must never change which pairs survive `>= t`, and must
      // report the exact value for every survivor
      ((gated >= t) == (exact >= t)) && (gated < t || gated == exact)
    }

  property("count-min: update/merge equals the definitional table under any split") =
    // full signed-64 range: raw xxhash64-style inputs must bucket in
    // [0, width) too (floorMod reduction), not just PolyHash values
    forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
           Gen.choose(1, 4), Gen.choose(2, 64), Gen.choose(0, 100)) { (hs, d, w, cut) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.LongType
      val agg = graft.functions.CountMinAgg(
        BoundReference(0, LongType, nullable = true), d, w)
      def build(part: Seq[Long]): Array[Long] =
        part.foldLeft(agg.createAggregationBuffer())(
          (b, h) => agg.update(b, InternalRow(h)))
      val (l, r) = hs.splitAt(cut % (hs.size + 1))
      // serialize round-trip on one side: the shuffle path must be lossless
      val rhs = build(r)
      val merged = agg.merge(build(l),
        if (rhs == null) null else agg.deserialize(agg.serialize(rhs)))
      val got = agg.eval(merged)
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      got == graft.functions.CountMinUtil.reference(hs, d, w).toSeq
    }

  property("bloom: update/merge equals the definitional word array under any split") =
    forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
           Gen.choose(1, 8), Gen.choose(1, 8), Gen.choose(0, 100)) { (hs, words, k, cut) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.LongType
      val m = words * 64
      val agg = graft.functions.BloomAgg(
        BoundReference(0, LongType, nullable = true), m, k)
      def build(part: Seq[Long]): Array[Long] =
        part.foldLeft(agg.createAggregationBuffer())(
          (b, h) => agg.update(b, InternalRow(h)))
      val (l, r) = hs.splitAt(cut % (hs.size + 1))
      val rhs = build(r)
      val merged = agg.merge(build(l),
        if (rhs == null) null else agg.deserialize(agg.serialize(rhs)))
      val got = agg.eval(merged)
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      got == graft.functions.BloomUtil.reference(hs, m, k).toSeq
    }

  property("bloom: no false negatives — every inserted hash is contained") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
           Gen.choose(1, 8), Gen.choose(1, 8)) { (hs, words, k) =>
      val m = words * 64
      val table = new GenericArrayData(graft.functions.BloomUtil.reference(hs, m, k))
      hs.forall { h =>
        graft.functions.BloomMightContain(null, null, k)
          .nullSafeEvalPublic(table, h).asInstanceOf[Boolean]
      }
    }

  property("winnow deque selection equals the per-window rightmost-min definition") =
    forAll(Gen.listOf(Gen.choose(0L, 50L)), Gen.choose(1, 8)) { (hs, w) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val got = graft.functions.WinnowUtil
        .select(new GenericArrayData(hs.toArray), w)
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getInt(0), r.getLong(1))
      }
      gotPairs == graft.functions.WinnowUtil.reference(hs, w)
    }

  property("nearest-cells top-n equals the definitional sort by (distance, cid)") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(4, Gen.choose(-8.0, 8.0))),
           Gen.listOfN(4, Gen.choose(-8.0, 8.0)),
           Gen.choose(1, 6), Gen.choose(0, 3)) { (cvsRaw, pv, n, dupEvery) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      // inject duplicate centroids (exact distance ties) at a generated cadence
      val cvs = cvsRaw.zipWithIndex.map { case (v, i) =>
        if (dupEvery > 0 && i % (dupEvery + 1) == dupEvery) cvsRaw((i - 1) max 0) else v
      }
      val cent = cvs.zipWithIndex.map { case (v, i) => (i * 3, v) } // non-contiguous cids
      val e = graft.functions.NearestCells(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true),
        cent.map(_._1), cent.map(_._2), n)
      val got = e.topCids(new GenericArrayData(pv.toArray)).toIntArray().toSeq
      def cmp(x: Double, y: Double) = if (x == y) 0 else java.lang.Double.compare(x, y)
      val want = cent.map { case (cid, cv) =>
        var pp = 0.0; pv.foreach(x => pp += x * x)
        var dot = 0.0
        var i = 0
        while (i < math.min(pv.size, cv.size)) { dot += pv(i) * cv(i); i += 1 }
        var cc = 0.0; cv.foreach(x => cc += x * x)
        (pp - 2.0 * dot + cc, cid)
      }.sortWith { case ((d1, c1), (d2, c2)) =>
        val c = cmp(d1, d2); c < 0 || (c == 0 && c1 < c2)
      }.take(n).map(_._2)
      got == want
    }

  property("strata lookup equals Map.getOrElse (missing keys fall to default)") =
    forAll(Gen.mapOf(Gen.zip(Gen.alphaNumStr.map(_.take(8)), Gen.long)),
           Gen.listOf(Gen.alphaNumStr.map(_.take(8))), Gen.long) { (table, probes, default) =>
      import org.apache.spark.unsafe.types.UTF8String
      val sorted = table.toSeq.sortBy(_._1)
      val e = graft.functions.StrataLookup(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.StringType, nullable = true),
        sorted.map(_._1), sorted.map(_._2), default)
      (probes ++ table.keys).forall { k =>
        e.get(UTF8String.fromString(k)) == table.getOrElse(k, default)
      }
    }

  property("pq lut equals the literal staging's per-entry arithmetic") =
    forAll(Gen.choose(1, 4), Gen.choose(1, 5), Gen.choose(1, 3),
           Gen.choose(0, 14), Gen.long) { (m, ksub, sd, qlen, seed) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val rnd = new scala.util.Random(seed)
      def vec(n: Int) = Seq.fill(n)(rnd.nextDouble() * 6 - 3)
      val books = Seq.fill(m)(Seq.fill(ksub)(vec(sd)))
      val q = vec(qlen) // qlen independent of m*sd: clipping semantics covered
      val e = graft.functions.PqLut(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true),
        books, sd)
      val got = e.lut(new GenericArrayData(q.toArray)).toDoubleArray().toSeq
      // the literal formulation: slice, then DotProduct's min-length folds
      val want = books.zipWithIndex.flatMap { case (b, j) =>
        val qj = q.slice(j * sd, j * sd + sd)
        var qq = 0.0; qj.foreach(x => qq += x * x)
        b.map { cv =>
          var dot = 0.0
          var i = 0
          while (i < math.min(qj.size, cv.size)) { dot += qj(i) * cv(i); i += 1 }
          var cc = 0.0; cv.foreach(x => cc += x * x)
          qq - 2.0 * dot + cc
        }
      }
      // bit-exact: same op order in both
      got == want
    }

  property("count-min estimate upper-bounds the exact count") =
    forAll(Gen.listOf(Gen.choose(0L, 40L).map(n => refHash(n.toString))),
           Gen.choose(2, 4), Gen.choose(2, 32)) { (hs, d, w) =>
      val table = graft.functions.CountMinUtil.reference(hs, d, w)
      hs.distinct.forall { h =>
        val est = (0 until d)
          .map(i => table(i * w + graft.functions.CountMinUtil.bucket(h, i, w))).min
        est >= hs.count(_ == h)
      }
    }

  /** Independent reference for the CCNet fold: regex-based mark strip and
    * whitespace split vs the expression's single code-point loop. The
    * split class is the portable Java-`\s` (the words()/oracle rule). */
  private def refFold(s: String): String = {
    val nfkd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val noMarks = nfkd.replaceAll("\\p{Mn}", "")
    val lowered = noMarks.codePoints().toArray
      .map(Character.toLowerCase)
      .map(cp => if (Character.isDigit(cp)) '0'.toInt else cp)
    new String(lowered, 0, lowered.length)
      .split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty).mkString(" ")
  }

  private val uniChar = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\r'),
    3 -> Gen.oneOf('é', 'É', 'ü', 'ß', 'ﬁ', 'Ａ', '１', '①', 'ö', 'ñ', 'Ç',
      '\u0301', '\u00A0', '\u3000', '²', 'Ⅷ'))

  property("unicodeFold matches the independent unicode reference") =
    forAll(Gen.listOf(uniChar).map(_.mkString)) { s =>
      graft.functions.UnicodeFoldUtil.fold(UTF8String.fromString(s))
        .toString == refFold(s)
    }

  property("vector min/max over random partition splits equals elementwise fold") =
    forAll(Gen.choose(1, 6).flatMap(dim =>
             Gen.nonEmptyListOf(Gen.listOfN(dim, Gen.choose(-5.0, 5.0)))),
           Gen.choose(1, 5), Gen.oneOf(true, false)) { (rows, nParts, isMax) =>
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val agg = graft.functions.VectorExtreme(
        BoundReference(0, ArrayType(DoubleType, containsNull = false),
          nullable = true), max = isMax)
      val parts = List.empty[List[Double]] ::
        rows.zipWithIndex.groupMap(_._2 % nParts)(_._1).values.toList
      val merged = parts
        .map(_.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
          agg.update(b, InternalRow(new GenericArrayData(v.toArray)))
        })
        .map(b => agg.deserialize(agg.serialize(b)))
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = agg.eval(merged).asInstanceOf[GenericArrayData].toDoubleArray.toSeq
      val expect = rows.transpose.map(c => if (isMax) c.max else c.min).toSeq
      got == expect
    }

  property("sq8 encode equals the definitional per-element affine clamp") =
    forAll(Gen.choose(1, 6).flatMap(dim =>
             Gen.zip(Gen.listOfN(dim, Gen.choose(-5.0, 5.0)),
                     Gen.listOfN(dim, Gen.choose(-5.0, 5.0)),
                     Gen.listOfN(dim, Gen.choose(-6.0, 6.0))))) { case (a, b, v) =>
      val lo = a.zip(b).map(t => math.min(t._1, t._2))
      val hi = a.zip(b).map(t => math.max(t._1, t._2))
      val e = graft.functions.Sq8Encode(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType), nullable = true), lo, hi)
      val got = e.encode(new GenericArrayData(v.toArray))
        .toIntArray().toSeq
      val expect = v.indices.map { j =>
        val s = hi(j) - lo(j)
        if (s == 0.0) 0
        else math.min(255, math.max(0,
          math.floor((v(j) - lo(j)) * 255.0 / s).toInt))
      }
      // decode error is bounded by half a step per element
      val dec = graft.functions.Sq8Decode(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType), nullable = true), lo, hi)
        .decode(new GenericArrayData(got.toArray)).toDoubleArray().toSeq
      val inRange = v.indices.forall { j =>
        val s = hi(j) - lo(j)
        val x = math.min(hi(j), math.max(lo(j), v(j))) // clamp like the codes do
        s == 0.0 || math.abs(dec(j) - x) <= s / 255.0 * 0.5 + 1e-9
      }
      got == expect && inRange
    }

  property("jl projection equals the definitional per-dim dot fold") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-5.0, 5.0)),
           Gen.choose(1, 8), Gen.choose(0, 3)) { (v, outDim, seed) =>
      val got = graft.functions.JlProjectUtil
        .project(new GenericArrayData(v.toArray), outDim, seed)
        .toDoubleArray().toSeq
      // independent order of loops (per-dim pass vs the expression's
      // per-element pass) — same left-to-right fold per dim, so bit-exact
      val expect = (0 until outDim).map { b =>
        var acc = 0.0
        v.zipWithIndex.foreach { case (x, j) =>
          acc += x * graft.functions.HyperplaneUtil.component(seed * outDim + b, j)
        }
        acc / math.sqrt(outDim.toDouble)
      }
      got == expect
    }

  /** The closed-form NTile behind perplexityBuckets' distributed rank
    * (TextOps' bucketC expression, mirrored here with Scala integer
    * division = SQL `div` for the non-negative operands in play):
    * PerplexityBucketsSpec pins it vs Spark's ntile exhaustively for
    * n <= 25; this property guards the div/mod arithmetic's edge regions
    * (n < k, n % k == 0, large n) over arbitrary (n <= 10^4, k <= 64)
    * against the definitional tiling (first n % k tiles hold one extra
    * row). */
  private def closedFormTile(n: Long, k: Long, r: Long): Long =
    if (r <= (n % k) * ((n / k) + 1)) (r - 1) / ((n / k) + 1) + 1
    else (n % k) + ((r - 1 - (n % k) * ((n / k) + 1)) / (n / k)) + 1

  private def definitionalTiles(n: Long, k: Long): Seq[Long] = {
    val big = n % k
    val base = n / k
    (1L to k).flatMap(t => Seq.fill((base + (if (t <= big) 1 else 0)).toInt)(t))
  }

  property("closed-form NTile equals the definitional tiling for n <= 10^4, k <= 64") =
    forAll(Gen.choose(1L, 10000L), Gen.choose(1L, 64L)) { (n, k) =>
      val want = definitionalTiles(n, k)
      (1L to n).forall(r => closedFormTile(n, k, r) == want((r - 1).toInt))
    }
}
