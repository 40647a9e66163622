package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BPE trainer checked against a plain-Scala replay of the canonical
  * algorithm (symbol LISTS + explicit left-to-right non-overlapping merge) —
  * independent of the delimited-string `replace` representation the engine
  * and oracle share, so a representation bug (delimiter collision, overlap
  * rescan) can't hide behind cross-engine agreement.
  */
class TokenizerSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def words(): Seq[String] =
    Tables.t(spark, sf, "documents").select("text").collect()
      .flatMap(r => r.getString(0).toLowerCase
        .replaceAll("[^a-z0-9]+", " ").trim.split(" ", -1))
      .filter(_.nonEmpty).toSeq

  private def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merge table, final word-type → symbols). */
  private def localBpe(merges: Int)
      : (Seq[(Long, String, String, String, Long)], Map[String, Vector[String]]) = {
    val census = words().groupBy(identity).view.mapValues(_.length.toLong).toMap
    var types: Map[String, Vector[String]] =
      census.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val table = Seq.newBuilder[(Long, String, String, String, Long)]
    (1 to merges).foreach { r =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      types.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + census(w)
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), c) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        table += ((r.toLong, a, b, a + b, c))
        types = types.view.mapValues(applyMerge(_, a, b)).toMap
      }
    }
    (table.result(), types)
  }

  test("bpe training matches the canonical symbol-list replay, merge by merge") {
    val got = run("pipe_bpe_train").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    val (expect, _) = localBpe(6)
    assert(got == expect,
      s"got:\n${got.mkString("\n")}\nexpected:\n${expect.mkString("\n")}")
    // ranks are 1..6 and merged symbols concatenate their pair
    got.foreach { case (_, a, b, m, _) => assert(m == a + b) }
  }

  test("bpe apply: per-source compression matches the replayed tokenizer") {
    val (_, types) = localBpe(6)
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).toLowerCase
        .replaceAll("[^a-z0-9]+", " ").trim.split(" ", -1).toSeq
        .filter(_.nonEmpty))
    val expect = docs.groupBy(_._1).view.mapValues { rows =>
      val occ = rows.flatMap(_._2)
      val chars = occ.map(_.length.toLong).sum
      val toks = occ.map(w => types(w).length.toLong).sum
      (occ.length.toLong, chars, toks,
        BigDecimal(chars.toDouble / toks)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = run("pipe_bpe_apply").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (src, (n, chars, toks, comp)) =>
      val (en, ec, et, ecomp) = expect(src)
      assert(n == en && chars == ec && toks == et,
        s"$src: got ($n,$chars,$toks) expected ($en,$ec,$et)")
      assert(math.abs(comp - ecomp) < 1e-9, src)
    }
    // BPE merges can only shorten: tokens ≤ chars, compression ≥ 1
    got.values.foreach { case (_, chars, toks, comp) =>
      assert(toks <= chars && comp >= 1.0)
    }
  }
}
