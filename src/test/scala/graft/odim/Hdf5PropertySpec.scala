package graft.odim

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import MiniHdf5Writer.{WDataset, WGroup}

/** Property-based round-trip coverage of the HDF5 dataset-layout matrix:
  * random shapes × chunk grids × index types × filter/int/float × depth-1
  * knobs must all survive writer → reader byte-exact. Complements the
  * hand-picked cases in [[Hdf5ModernSpec]] with the shapes nobody thought
  * to write down (prime dims, 1×n grids, chunk == extent, heavy edge
  * clipping).
  */
class Hdf5PropertySpec extends AnyFunSuite {

  private def run(prop: Prop, n: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genCase = for {
    rank <- Gen.choose(1, 3)
    dims <- Gen.listOfN(rank, Gen.choose(1L, 13L))
    // per-dim grid of at most 4 => at most 64 chunks: inside the writer's
    // EA capacity (244 at its default cparams) and single-page fixed array
    chunk <- Gen.sequence[List[Long], Long](
      dims.map(d => Gen.choose((d + 3) / 4, d)))
    idxType <- Gen.oneOf(0, 1, 2, 3, 4, 5) // 0 = v3 v1-btree; 1..5 = layout v4
    isInt <- Gen.oneOf(true, false)
    gzip <- Gen.oneOf(true, false)
    depth <- Gen.oneOf(0, 1, 2)
    // shrunken EA cparams reach secondary blocks and PAGED data blocks
    // with the same tiny chunk counts
    eaShrunk <- Gen.oneOf(true, false)
    seed <- Gen.choose(0, 1000)
  } yield (dims.toArray, chunk.toArray, idxType, isInt, gzip, depth, eaShrunk, seed)

  test("random dataset shapes round-trip across every chunk-index type") {
    run(Prop.forAllNoShrink(genCase) {
      case (dims, chunk0, idxType, isInt, gzip0, depth, eaShrunk, seed) =>
        val n = dims.product.toInt
        val values = Array.tabulate(n)(i => ((i * 31 + seed * 7) % 251).toDouble)
        // constraints of the format/writer, applied rather than discarded:
        // single-chunk index needs chunk == extent; implicit + v1-btree +
        // fixed-array writer paths are unfiltered; gzip v4 support = EA +
        // v2-btree; a depth-d v2-btree needs >= 2^(d+1)-1 chunk records
        val chunk = if (idxType == 1) dims.clone() else chunk0
        val gzip = gzip0 && (idxType == 4 || idxType == 5)
        val nChunks = dims.zip(chunk).map { case (d, c) => (d + c - 1) / c }.product
        val ds = WDataset(Nil, dims, values, isInt = isInt,
          elemSize = if (isInt) 4 else 8,
          chunkDims = Some(chunk),
          layoutV4 = if (idxType == 0) None else Some(idxType),
          gzip = gzip,
          btreeDepth = if (idxType != 5) 0
            else math.min(depth, if (nChunks >= 7) 2 else if (nChunks >= 3) 1 else 0),
          eaCparams = if (eaShrunk) (2, 4, 2, 2) else (4, 16, 4, 10))
        val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
        val back = f.dataset(f.resolve("d").get)
        back.dims.toSeq == dims.toSeq &&
          back.values.toSeq == values.toSeq &&
          back.isInteger == isInt
    }, 200)
  }

  test("random wide groups round-trip through compact, dense, and deep dense storage") {
    run(Prop.forAllNoShrink(for {
      nLinks <- Gen.choose(1, 40)
      nAttrs <- Gen.choose(0, 12)
      depth <- Gen.oneOf(0, 1, 2)
    } yield (nLinks, nAttrs, depth)) { case (nLinks, nAttrs, depth) =>
      val attrs = (0 until nAttrs).map(i => (f"a_$i%02d", (i * 3).toLong: Any))
      val children = (0 until nLinks).map { i =>
        f"c_$i%02d" -> (WDataset(Nil, Array(2L), Array(i.toDouble, i + 0.5),
          isInt = false, elemSize = 8): MiniHdf5Writer.Node)
      }
      val f = Hdf5File(MiniHdf5Writer.write(
        WGroup(attrs, children,
          denseDepth = if (nLinks > 8) math.min(depth, if (nLinks >= 7) 2 else 1) else 0)))
      val root = f.rootHeaderAddr
      f.groupChildren(root).size == nLinks &&
        f.attributes(root).size == nAttrs &&
        (0 until nLinks).forall { i =>
          f.dataset(f.resolve(f"c_$i%02d").get).values.toSeq ==
            Seq(i.toDouble, i + 0.5)
        }
    }, 60)
  }

  test("random dense groups round-trip across every fractal-heap shape") {
    // the round-6 heap matrix: nested indirect roots (small maxDirect),
    // filtered (whole-block deflate), wide IDs (short names go TINY),
    // small max-managed (long names go HUGE), and name-length mixes that
    // put several object kinds in ONE heap
    run(Prop.forAllNoShrink(for {
      nLinks <- Gen.choose(9, 60) // always dense
      maxDirect <- Gen.oneOf(65536L, 1024L)
      filtered <- Gen.oneOf(true, false)
      idLen <- Gen.oneOf(7, 18)
      // all four (idLen, filtered) x huge combos are real shapes now:
      // idLen=7 -> btree-tracked huge (type-1; type-2 with filtered
      // extras when the heap is filtered); idLen=18 unfiltered -> DIRECT
      // huge ids (libhdf5's threshold: id payload 17 >= addr+size 16);
      // idLen=18 filtered stays btree-tracked (filtered direct needs
      // payload >= 28, i.e. idLen >= 29)
      maxManaged <- Gen.oneOf(4096, 64)
      pad <- Gen.choose(0, 120) // name padding drives body size / kind
      seed <- Gen.choose(0, 1000)
    } yield (nLinks, maxDirect, filtered, idLen, maxManaged, pad, seed)) {
      case (nLinks, maxDirect, filtered, idLen, maxManaged, pad, seed) =>
        val children = (0 until nLinks).map { i =>
          // vary padding per link so one heap mixes tiny/managed/huge
          val p = (pad + i * 17 + seed) % 121
          val name = f"l$i%02d" + "x" * p
          name -> (WDataset(Nil, Array(1L), Array(i + 0.25),
            isInt = false, elemSize = 8): MiniHdf5Writer.Node)
        }
        val f = Hdf5File(MiniHdf5Writer.write(
          WGroup(Nil, children, heapMaxDirect = maxDirect,
            heapFiltered = filtered, heapIdLen = idLen,
            heapMaxManaged = maxManaged)))
        f.groupChildren(f.rootHeaderAddr).size == nLinks &&
          children.indices.forall { i =>
            f.dataset(f.resolve(children(i)._1).get).values.toSeq == Seq(i + 0.25)
          }
    }, 80)
  }
}
