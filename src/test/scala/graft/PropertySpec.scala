package graft

import graft.arrays.HashRing
import graft.streaming.Streams
import org.scalacheck.{Gen, Prop, Properties}

/** Driver-side property tests (no Spark session needed): the invariants
  * that make the ring and the sessionizer correct for *any* input, not
  * just the fixtures.
  */
object GraftProperties extends Properties("graft") {

  private val keyGen: Gen[String] = Gen.asciiPrintableStr.suchThat(_.nonEmpty)

  property("ring.assignsKnownNode") = Prop.forAll(keyGen) { k =>
    HashRing.currentNodes.contains(HashRing.current.getNode(k))
  }

  property("ring.deterministic") = Prop.forAll(keyGen) { k =>
    HashRing.current.getNode(k) == HashRing.current.getNode(k)
  }

  property("ring.genKeyIsU32") = Prop.forAll(keyGen) { k =>
    val h = HashRing.current.genKey(k)
    h >= 0L && h < (1L << 32)
  }

  // Consistent-hashing growth property — in its *reference-faithful* form.
  // Pure consistent hashing would only move keys TO the joining node, but
  // the reference's vnode factor depends on cluster size
  // (hash_ring.py:38: floor(40·N·w/Σw)), so existing nodes gain vnodes on
  // growth and a small fraction of keys genuinely churns between old
  // nodes. The invariant is therefore statistical: most keys keep their
  // owner, and old→old churn stays a small fraction (observed ~5%;
  // bounded at 15% ≈ 6σ for 200 keys).
  property("ring.growthMovesBoundedChurn") =
    Prop.forAll(Gen.listOfN(200, keyGen)) { keys =>
      val moves = keys.map(k =>
        (HashRing.current.getNode(k), HashRing.target.getNode(k)))
      val oldToOld = moves.count { case (b, a) => b != a && a != "node-d" }
      val toNew = moves.count { case (_, a) => a == "node-d" }
      (keys.isEmpty || oldToOld <= math.max(2, keys.size * 15 / 100)) &&
        toNew <= keys.size // sanity: counts are well-formed
    }

  // the driver-side map and the executor-side RingTable are built from one
  // canonical (key -> node) resolution; they must agree for every key
  private val currentTable = new graft.plans.RingTable(HashRing.current)
  property("ring.driverAndExecutorLookupAgree") = Prop.forAll(keyGen) { k =>
    currentTable.lookup(HashRing.current.genKey(k)).toString ==
      HashRing.current.getNode(k)
  }

  // RingReplicas must agree with a naive reference walk: sort keys, start
  // at the successor, collect first-k distinct nodes clockwise
  property("ring.replicasMatchNaiveWalk") = Prop.forAll(keyGen) { k =>
    val h = HashRing.current.genKey(k)
    val entries = HashRing.current.canonical
    val (after, before) = entries.partition(_._1 > h)
    val naive = (after ++ before).map(_._2).distinct.take(3)
    val got = currentTable.replicasData(h, 3)
    (0 until got.numElements()).map(i => got.getUTF8String(i).toString) == naive
  }

  // Det.scala's tie contract: double->decimal(18,4) ties (dyadic values
  // like 0.03125 = 1/32) round half-away-from-zero in Spark; DuckDB was
  // verified to do the same (0.03125 -> 0.0313, -0.03125 -> -0.0313).
  property("det.decimalTieRoundsHalfUp") = Prop {
    def sparkRound(d: Double): java.math.BigDecimal = {
      val dec = org.apache.spark.sql.types.Decimal(d)
      dec.changePrecision(18, 4)
      dec.toJavaBigDecimal
    }
    sparkRound(0.03125).compareTo(new java.math.BigDecimal("0.0313")) == 0 &&
      sparkRound(-0.03125).compareTo(new java.math.BigDecimal("-0.0313")) == 0
  }

  // GridSource's stride alignment: first index >= lo congruent to
  // anchor mod step — the invariant every strided tile reader relies on
  property("grid.alignFirstCongruentIndex") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(-1000L, 1000000L),
                Gen.chooseNum(1L, 10000L)) { (lo, anchor, step) =>
      val aligned = lo + (((anchor - lo) % step) + step) % step
      aligned >= lo && aligned < lo + step &&
        ((aligned - anchor) % step + step) % step == 0
    }

  private val eventsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOf(for {
      ts <- Gen.chooseNum(0L, 100L * 3600 * 1000000) // 100h span, us
      v <- Gen.chooseNum(0, 100000).map(_ / 100.0)
    } yield (7L, ts, v))

  property("sessions.partitionAllEvents") = Prop.forAll(eventsGen) { evs =>
    val sessions = Streams.buildSessions(7L, evs.iterator).toList
    sessions.map(_.n_events).sum == evs.size
  }

  property("bloom.positionInRangeForAnyLong") =
    Prop.forAll(Gen.choose(0, graft.functions.BloomImpl.K - 1),
                Gen.choose(Long.MinValue, Long.MaxValue)) { (j, h) =>
      // the probe expression accepts ANY LongType column, not just u32
      // fingerprints — positions must stay in-bitset for every input
      val p = graft.functions.BloomImpl.position(j, h)
      p >= 0 && p < graft.functions.BloomImpl.NumBits
    }

  property("bloom.noFalseNegativesForAnyLong") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(Long.MinValue, Long.MaxValue))) { hs =>
      val words = new Array[Long](graft.functions.BloomImpl.NumWords)
      hs.foreach(graft.functions.BloomImpl.setBits(words, _))
      val bytes = graft.functions.BloomImpl.serialize(words)
      hs.forall(graft.functions.BloomImpl.mightContain(bytes, _))
    }

  // Ppm codec: the m-family's real decoder must be total over its own
  // encoder's range and reject every malformed header — for ANY image,
  // not just the fixtures PipelineSpec hand-corrupts.
  private val imgGen: Gen[graft.pipeline.Ppm.Image] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 40)
    raster <- Gen.containerOfN[Array, Byte](
      3 * w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield graft.pipeline.Ppm.Image(w, h, raster)

  property("ppm.roundTrip") = Prop.forAll(imgGen) { img =>
    val out = graft.pipeline.Ppm.decode(graft.pipeline.Ppm.encode(img))
    out.width == img.width && out.height == img.height &&
      java.util.Arrays.equals(out.raster, img.raster)
  }

  property("ppm.rejectsTruncationAndTrailingGarbage") =
    Prop.forAll(imgGen, Gen.chooseNum(1, 5)) { (img, k) =>
      val good = graft.pipeline.Ppm.encode(img)
      Prop.throws(classOf[GraftMediaDecodeError]) {
        graft.pipeline.Ppm.decode(good.dropRight(k))
      } && Prop.throws(classOf[GraftMediaDecodeError]) {
        graft.pipeline.Ppm.decode(good ++ Array.fill(k)(0: Byte))
      }
    }

  // strict-parser guarantee: flipping ANY single header byte to any other
  // value is caught — by the magic check, the header grammar, the
  // maxval/dims validation, or the raster-length-vs-promise check (a
  // changed dimension digit changes the promised raster size)
  property("ppm.rejectsAnyHeaderByteFlip") =
    Prop.forAll(imgGen, Gen.chooseNum(0, 255)) { (img, b) =>
      val good = graft.pipeline.Ppm.encode(img)
      val headerLen = good.length - img.raster.length
      Prop.forAll(Gen.chooseNum(0, headerLen - 1)) { pos =>
        val mut = good.clone()
        mut(pos) = b.toByte
        mut(pos) == good(pos) || Prop.throws(classOf[GraftMediaDecodeError]) {
          graft.pipeline.Ppm.decode(mut)
        }
      }
    }

  property("sessions.gapInvariants") = Prop.forAll(eventsGen) { evs =>
    val sessions = Streams.buildSessions(7L, evs.iterator).toList
    val ordered = sessions.sortBy(_.sess_idx)
    // sessions are time-ordered, non-overlapping, separated by > gap;
    // within a session start<=end and span has no internal gap > 30min
    // (checked against the raw events)
    val ts = evs.map(_._2).sorted
    val internalOk = ordered.forall { s =>
      val inSess = ts.filter(t => t >= s.start_us && t <= s.end_us)
      inSess.zip(inSess.drop(1)).forall { case (a, b) => b - a <= Streams.SessionGapUs }
    }
    val betweenOk = ordered.zip(ordered.drop(1)).forall { case (a, b) =>
      b.start_us - a.end_us > Streams.SessionGapUs
    }
    val idxOk = ordered.map(_.sess_idx) == (1L to ordered.size).toList
    internalOk && betweenOk && idxOk
  }

  // --- PQ / bigram kernels (JVM-level, no Spark session) ------------------
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val tokGen: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))

  property("bigram.keysMatchPerPairGenKey") = Prop.forAll(tokGen) { toks =>
    val arr = new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): Any).toArray)
    val got = graft.functions.BigramKeysImpl.keys(arr)
    val expected = toks.zip(toks.drop(1)).map { case (a, b) =>
      graft.functions.GenKeyImpl.genKey(UTF8String.fromString(s"$a $b"))
    }
    got.numElements() == math.max(0, toks.size - 1) &&
      (0 until got.numElements()).forall(i => got.getLong(i) == expected(i))
  }

  private val pqSub = 4
  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(pqSub * 2, Gen.chooseNum(-8.0, 8.0)).map(_.toArray)
  private val cbGen: Gen[List[Array[Double]]] =
    Gen.nonEmptyListOf(vecGen).map(_.take(8))

  property("pq.encodePicksTheScoreArgminPerSubspace") =
    Prop.forAll(vecGen, cbGen) { (v, cb) =>
      val cbArr = new GenericArrayData(
        cb.map(c => new GenericArrayData(c): Any).toArray)
      val codes = graft.functions.PqImpl.encode(
        new GenericArrayData(v), cbArr, pqSub)
      // reference model: per subspace, the first centroid index whose
      // score ||c_m||^2 - 2 v_m . c_m  is minimal (same fold order)
      (0 until v.length / pqSub).forall { mm =>
        val base = mm * pqSub
        val scores = cb.map { c =>
          var ssq = 0.0; var dot = 0.0
          (0 until pqSub).foreach { d => ssq += c(base + d) * c(base + d) }
          (0 until pqSub).foreach { d => dot += v(base + d) * c(base + d) }
          ssq - 2.0 * dot
        }
        codes.getLong(mm) == scores.indexOf(scores.min).toLong
      }
    }

  property("pq.adcIsTheCodeIndexedFoldAndNonNegativeOnTrueDistances") =
    Prop.forAll(vecGen, cbGen) { (v, cb) =>
      val cbArr = new GenericArrayData(
        cb.map(c => new GenericArrayData(c): Any).toArray)
      val codes = graft.functions.PqImpl.encode(
        new GenericArrayData(v), cbArr, pqSub)
      val m = v.length / pqSub
      // true per-subspace squared distances as the table
      val dtab = Array.tabulate(m) { mm =>
        cb.map { c =>
          var acc = 0.0
          (0 until pqSub).foreach { d =>
            val diff = v(mm * pqSub + d) - c(mm * pqSub + d); acc += diff * diff
          }
          acc
        }.toArray
      }
      val adc = graft.functions.PqImpl.adc(
        new GenericArrayData(dtab.map(r => new GenericArrayData(r): Any)),
        codes)
      val direct = (0 until m).foldLeft(0.0) { (acc, mm) =>
        acc + dtab(mm)(codes.getLong(mm).toInt)
      }
      // argmin optimality transfers: ADC over encoded codes is the
      // minimal table sum over ANY code assignment (tiny slack: encode
      // ranks by the ||v_m||^2-shifted score, IEEE can collapse ties)
      val minSum = (0 until m).foldLeft(0.0) { (acc, mm) => acc + dtab(mm).min }
      adc == direct && adc >= 0.0 && adc <= minSum + 1e-9 * m
    }
}
