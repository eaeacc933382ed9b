package graft.tools

import org.json4s._
import org.json4s.jackson.JsonMethods

/** MECHANIZED drift adjudication (round 18, verdict r17 #4).
  *
  * Every round ends by comparing the fresh bench sample against the
  * stable baseline, flagging per-query regressions at the house bar
  * (≥1.5× AND +0.5 s), and — because this host's single-pass numbers
  * are contention-dominated (round 17: ann_recall read 121 s in the
  * driver pass, 8.1 s on an idle re-read of UNTOUCHED code) — re-reading
  * every flagged query in an isolated fresh JVM before calling it a code
  * regression. Rounds 14–17 did the re-read by hand; this tool IS that
  * procedure, so the adjudication is reproducible from its printed rows:
  *
  * {{{
  * runMain graft.tools.BenchDrift BENCH_STABLE.json BENCH_r17.json [norerun]
  * }}}
  *
  * Rows (grep-able, the SCALING.md verdict shape):
  *   - `DRIFTCHK`     — the inputs, the bar, both files' calib markers
  *     (read these FIRST: inflated markers already say "host", and the
  *     isolated re-read then confirms it per query);
  *   - `DRIFT`        — one per flagged query (old/new/ratio);
  *   - `DRIFTVERDICT` — one per flagged query after the isolated re-read:
  *     `environmental` (isolated time back under the bar — the inflation
  *     did not survive a quiet JVM) or `code-regression` (it did);
  *   - `DRIFTSUMMARY` — counts + the round verdict.
  *
  * The isolated re-read runs `graft.Bench` in a FRESH JVM (same
  * classpath/heap defaults as the hand procedure) with
  * `SPARK_GRAFT_BENCH_ONLY` = the flagged set, repeats =
  * `SPARK_GRAFT_DRIFT_REPEATS` (default 3, median), writing to a temp
  * file so no committed artifact is touched (the Bench side enforces the
  * same — BENCH_SUBSET_STABLE.json, round 18). When any flagged query is
  * a serve query, every `index_build_*` entry joins the subset so build
  * cost lands on its own lines instead of inside the first serve query
  * that finds its artifact missing (Bench's own subset-attribution rule).
  */
object BenchDrift {

  /** One parsed bench JSON line. `queries` keeps only non-error entries
    * (Bench records -1 for a query that threw — not a timing). */
  final case class BenchSample(
      file: String,
      queries: Map[String, Double],
      errors: Set[String],
      calib: Seq[Double],
      repeats: Int,
      setupSec: Double)

  def parse(file: String, text: String): BenchSample = {
    val j = JsonMethods.parse(text)
    def d(v: JValue): Double = v match {
      case JDouble(x) => x
      case JInt(x) => x.toDouble
      case JLong(x) => x.toDouble
      case JDecimal(x) => x.toDouble
      case _ => Double.NaN
    }
    val qs = (j \ "queries") match {
      case JObject(fields) => fields.map { case (k, v) => k -> d(v) }.toMap
      case _ => Map.empty[String, Double]
    }
    val errs = (j \ "errors") match {
      case JObject(fields) => fields.map(_._1).toSet
      case _ => Set.empty[String]
    }
    val calib = Seq("calib_before_sec", "calib_mid_sec", "calib_after_sec")
      .map(k => d(j \ k)).filterNot(_.isNaN)
    val reps = d(j \ "repeats") match {
      case x if x.isNaN => 1
      case x => x.toInt
    }
    BenchSample(file, qs.filter(_._2 >= 0), errs ++ qs.filter(_._2 < 0).keys,
      calib, reps, d(j \ "setup_sec"))
  }

  /** The house regression bar: ≥ `ratio`× AND ≥ `delta` s slower. One
    * predicate, used for both the flag and the isolated-verdict clear. */
  def overBar(oldSec: Double, newSec: Double,
      ratio: Double = 1.5, delta: Double = 0.5): Boolean =
    newSec >= ratio * oldSec && newSec - oldSec >= delta

  /** Queries of `cand` over the bar vs `base` (both present, neither an
    * error), worst ratio first. */
  def flag(base: BenchSample, cand: BenchSample): Seq[(String, Double, Double)] =
    base.queries.keySet.intersect(cand.queries.keySet).toSeq
      .map(q => (q, base.queries(q), cand.queries(q)))
      .filter { case (_, o, n) => overBar(o, n) }
      .sortBy { case (_, o, n) => -(n / math.max(o, 1e-9)) }

  private def fmtCalib(s: BenchSample): String =
    if (s.calib.isEmpty) "none" else s.calib.map(c => f"$c%.3f").mkString("/")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDrift <baseline.json> <candidate.json> [norerun]")
    val rerun = !args.lift(2).contains("norerun")
    def load(p: String) = parse(p,
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        "UTF-8"))
    val base = load(args(0))
    val cand = load(args(1))
    println(s"DRIFTCHK baseline=${args(0)} candidate=${args(1)} " +
      s"bar=1.5x+0.5s n_base=${base.queries.size} n_cand=${cand.queries.size} " +
      s"calib_base=${fmtCalib(base)} calib_cand=${fmtCalib(cand)} " +
      s"setup_base=${f"${base.setupSec}%.1f"} setup_cand=${f"${cand.setupSec}%.1f"}")
    (base.errors ++ cand.errors).toSeq.sorted.foreach(q =>
      println(s"DRIFTERR query=$q (excluded: recorded as error in an input)"))
    val flagged = flag(base, cand)
    flagged.foreach { case (q, o, n) =>
      println(f"DRIFT query=$q old=$o%.2f new=$n%.2f ratio=${n / o}%.2f") }
    if (flagged.isEmpty) {
      println("DRIFTSUMMARY flagged=0 confirmed=0 environmental=0 verdict=clean")
      return
    }
    if (!rerun) {
      println(s"DRIFTSUMMARY flagged=${flagged.size} confirmed=? " +
        "environmental=? verdict=unadjudicated (norerun)")
      return
    }

    // ---- isolated re-read: graft.Bench in a fresh JVM on the flagged set
    val buildQs = graft.operators.IndexBuild.artifactNames.keys.toSeq.sorted
    val needsBuilds = flagged.exists(f => !f._1.startsWith("index_build_"))
    val subset = (flagged.map(_._1) ++ (if (needsBuilds) buildQs else Nil))
      .distinct.sorted
    val reps = sys.env.get("SPARK_GRAFT_DRIFT_REPEATS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val out = java.nio.file.Files.createTempFile("bench-drift", ".json")
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    // match the hand procedure's JVM: inherit this process's -Xmx when set
    java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
      .forEach(a => if (a.startsWith("-Xmx") || a.startsWith("-Xms")) cmd.add(a))
    cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
    cmd.add("graft.Bench")
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_BENCH_ONLY", subset.mkString(","))
    pb.environment().put("SPARK_GRAFT_BENCH_REPEATS", reps.toString)
    pb.environment().put("BENCH_JSON_OUT", out.toString)
    pb.redirectErrorStream(false)
    pb.redirectOutput(ProcessBuilder.Redirect.INHERIT)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    println(s"DRIFTRERUN subset=${subset.mkString(",")} repeats=$reps " +
      s"sf=${sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "(bench default)")}")
    val code = pb.start().waitFor()
    require(code == 0, s"isolated bench JVM exited $code")
    val iso = load(out.toString)
    java.nio.file.Files.deleteIfExists(out)

    var confirmed = 0
    var environmental = 0
    flagged.foreach { case (q, o, n) =>
      iso.queries.get(q) match {
        case Some(i) =>
          val still = overBar(o, i)
          if (still) confirmed += 1 else environmental += 1
          println(f"DRIFTVERDICT query=$q old=$o%.2f new=$n%.2f " +
            f"isolated=$i%.2f verdict=${if (still) "code-regression"
              else "environmental"} calib_iso=${fmtCalib(iso)}")
        case None =>
          confirmed += 1 // an error on the re-read is not a clearance
          println(s"DRIFTVERDICT query=$q old=${f"$o%.2f"} new=${f"$n%.2f"} " +
            "isolated=error verdict=code-regression (re-read errored)")
      }
    }
    println(s"DRIFTSUMMARY flagged=${flagged.size} confirmed=$confirmed " +
      s"environmental=$environmental verdict=${
        if (confirmed == 0) "environmental-noise" else "code-regression"}")
  }
}
