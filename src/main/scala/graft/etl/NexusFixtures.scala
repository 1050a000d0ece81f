package graft.etl

import graft.sources.{Hdf5Writer => W}

/** Deterministic NeXus run-file corpus for the HDF5 ingestion path — the
  * `.nxs.h5` counterpart of the multimodal fixture builders: every value
  * derives from run/bank/position arithmetic, so a DuckDB oracle can
  * rederive the expected 8-table output without ever parsing HDF5
  * (the `nexus_h5_*` oracle entries replay these formulas in SQL).
  *
  * Content formulas for run index `r` (run_number = 1000 + r):
  *   - pulses: P(r) = 32 + 8·(r mod 4); pulse p's wall time = p/64
  *     (exact binary), logged as DASlogs/proton_charge with
  *     value[p] = 10 + (p mod 5)
  *   - banks b ∈ 0..2 named `bank{b+1}_events`, plus `monitor1` (b = 3):
  *     events-per-pulse k = 1 + ((r + b) mod 3) for b < 3, k = 1 for the
  *     monitor; n = P·k events; event_index[p] = p·k;
  *     event_id[e] = (7e + 13b + r) mod 512;
  *     event_time_offset[e] = ((31e + 11b) mod 1000)/64 (exact binary)
  *   - Speed1 log: 16 points, time = p/4, value = 100 + (p mod 7),
  *     average/minimum/maximum metadata 103/100/106
  *   - Veto_pulse log: NO time/value series — veto_pulse_time only,
  *     8 points at 1/2 + p (exercises parquet.py:349-352's fallback:
  *     times ← veto_pulse_time, values ← ones)
  *   - ChopperStatus log: 3 string points OPEN/CLOSED/OPEN (value_numeric
  *     must come out NULL)
  *   - metadata: duration = 3600 + r, proton_charge = 1000 + r/2,
  *     total_counts = Σ_b n(r,b), experiment_identifier =
  *     `IPTS-{2000 + (r mod 5)}`, definition `NXsns`, notes is a
  *     VARIABLE-LENGTH string (exercises the global-heap path)
  *   - sample: mass = 1 + r/4, temperature = 300 + r, plus a `container`
  *     field that must land in additional_fields
  *   - users: 1 + (r mod 2) of them; Software/nexus_writer v1.2.3
  *
  * Event datasets are chunked with shuffle+deflate (the layout facility
  * files actually use); the rest is contiguous.
  */
object NexusFixtures {

  val Banks = 4 // bank1..bank3 + monitor1

  def pulses(r: Int): Int = 32 + 8 * (r % 4)
  def eventsPerPulse(r: Int, b: Int): Int = if (b == 3) 1 else 1 + ((r + b) % 3)
  def nEvents(r: Int, b: Int): Int = pulses(r) * eventsPerPulse(r, b)
  def bankName(b: Int): String = if (b == 3) "monitor1" else s"bank${b + 1}_events"
  def totalCounts(r: Int): Long =
    (0 until Banks).map(b => nEvents(r, b).toLong).sum

  /** `pulseScale` multiplies the pulse count (and with it every event
    * array) without touching the per-position formulas — the same bytes
    * recipe serves the 6-run oracle corpus (scale 1) and the BenchScale
    * ingest probe (scale in the hundreds → tens of thousands of pulses
    * and ~100k events per file, the realistic run-file shape). */
  def runFileBytes(r: Int, pulseScale: Int = 1): Array[Byte] = {
    val p = pulses(r) * pulseScale

    val bankGroups = (0 until Banks).map { b =>
      val k = eventsPerPulse(r, b)
      // n follows the SCALED pulse count — event arrays, event_index,
      // and total_counts must agree at every pulseScale, or the
      // interval explode would index past the data
      val n = p * k
      W.Group(bankName(b), Seq(
        W.Dataset("event_id",
          W.LongData(Array.tabulate(n)(e => ((7L * e + 13L * b + r) % 512)),
            width = 4, signed = false),
          chunk = math.max(16, n / 4), deflate = true, shuffle = true),
        // the offsets datasets spread across the chunk-index generations
        // so EVERY index rides the oracle corpus end to end: bank 1 =
        // 1.10+ FIXED ARRAY, bank 2 = EXTENSIBLE ARRAY (enough chunks to
        // overflow the index block into data blocks — the appendable
        // event-stream shape), bank 3 = VERSION-2 B-TREE (node size
        // forced small → a depth-1 tree), the rest classic v1-b-tree v3
        W.Dataset("event_time_offset",
          W.DoubleData(Array.tabulate(n)(e => ((31L * e + 11L * b) % 1000) / 64.0)),
          chunk = b match {
            case 2 => math.max(8, n / 24)
            case 3 => math.max(8, n / 10)
            case _ => math.max(16, n / 4)
          },
          deflate = true,
          layoutV4 = b match { case 1 => 3; case 2 => 4; case 3 => 5; case _ => 0 },
          btNodeSize = 128),
        W.Dataset("event_index",
          W.LongData(Array.tabulate(p)(pi => pi.toLong * k))),
        W.scalarLong("total_counts", n.toLong)),
        attrs = Seq("NX_class" -> W.AttrStr("NXevent_data")))
    }

    // DASlogs is written DENSE (fractal heap + name-index v2 b-tree —
    // the libhdf5-1.8+ layout for device-log groups, which routinely
    // exceed the 8-link compact bound), so every nexus_h5_* oracle and
    // the daslogs_stats walk ride dense-link decoding end to end
    val daslogs = W.Group("DASlogs", dense = true, children = Seq(
      W.Group("proton_charge", Seq(
        W.Dataset("time", W.DoubleData(Array.tabulate(p)(_ / 64.0))),
        W.Dataset("value", W.DoubleData(Array.tabulate(p)(i => 10.0 + i % 5))),
        W.scalarStr("device_name", "beam_monitor"),
        W.scalarStr("device_id", "dev7"))),
      W.Group("Speed1", Seq(
        W.Dataset("time", W.DoubleData(Array.tabulate(16)(_ / 4.0))),
        W.Dataset("value", W.DoubleData(Array.tabulate(16)(i => 100.0 + i % 7))),
        W.scalarDouble("average_value", 103.0),
        W.scalarDouble("minimum_value", 100.0),
        W.scalarDouble("maximum_value", 106.0))),
      W.Group("Veto_pulse", Seq(
        W.Dataset("veto_pulse_time",
          W.DoubleData(Array.tabulate(8)(i => 0.5 + i))))),
      W.Group("ChopperStatus", Seq(
        W.Dataset("time", W.DoubleData(Array(0.0, 1.0, 2.0))),
        W.Dataset("value", W.StringData(Array("OPEN", "CLOSED", "OPEN"))))),
      // wild-writer shape: ONE compound time/value struct table (h5py
      // struct array) instead of separate series — exercises the
      // class-6 datatype decode end-to-end through the daslogs walk
      W.Group("FlowRate", Seq(
        W.Dataset("time_value", W.CompoundData(Seq(
          "time" -> W.DoubleData(Array.tabulate(12)(_ / 4.0)),
          "value" -> W.DoubleData(Array.tabulate(12)(i => 5.0 + i % 3)))))))))

    val users = (0 until (1 + r % 2)).map { u =>
      W.Group(s"user${u + 1}", Seq(
        W.scalarStr("name", s"User ${r}${('A' + u).toChar}"),
        W.scalarStr("facility_user_id", s"F${1000 + 10 * r + u}"),
        W.scalarStr("role", if (u == 0) "PI" else "scientist")))
    }

    val entry = W.Group("entry",
      Seq(
        W.scalarStr("title", s"Run ${1000 + r}"),
        W.scalarLong("run_number", 1000L + r),
        W.scalarStr("start_time", "2024-01-01T00:00:00"),
        W.scalarStr("end_time", "2024-01-01T01:00:00"),
        W.scalarDouble("duration", 3600.0 + r),
        W.scalarDouble("proton_charge", 1000.0 + r / 2.0),
        W.scalarLong("total_counts", totalCounts(r) * pulseScale),
        W.scalarStr("experiment_identifier", s"IPTS-${2000 + r % 5}"),
        W.scalarStr("definition", "NXsns"),
        W.Dataset("notes",
          W.VlenStringData(Array(s"notes for run ${1000 + r}")), scalar = true),
        W.Group("sample", Seq(
          W.scalarStr("name", s"SAMPLE_$r"),
          W.scalarStr("nature", "liquid"),
          W.scalarStr("chemical_formula", "H2O"),
          W.scalarDouble("mass", 1.0 + r / 4.0),
          W.scalarDouble("temperature", 300.0 + r),
          W.scalarStr("container", s"can$r"))),
        W.Group("instrument", Seq(
          W.scalarStr("name", "NXS"),
          W.scalarStr("beamline", s"BL${r % 4}"),
          W.Group("detector", Seq(
            W.scalarLong("n_pixels", 65536L),
            W.scalarStr("geometry", "cylindrical"))))),
        W.Group("Software", Seq(
          W.Group("nexus_writer", Seq(
            W.scalarStr("name", "nwriter"),
            W.scalarStr("version", "1.2.3"))))),
        daslogs) ++ users ++ bankGroups,
      // 10 attributes written DENSE (Attribute Info + fractal heap +
      // type-8 name index — the libhdf5 layout beyond 8 attrs): the
      // oracles read NX_class THROUGH the dense path, so a silent
      // dense-attribute miss turns nx_class NULL and goes red
      attrs = Seq("NX_class" -> W.AttrStr("NXentry"),
        "facility" -> W.AttrStr("NXS"),
        "proposal" -> W.AttrStr(s"IPTS-${2000 + r % 5}"),
        "cycle" -> W.AttrLong(2024L),
        "revision" -> W.AttrLong(r.toLong),
        "operator_shift" -> W.AttrStr(s"shift${r % 3}"),
        "calibration" -> W.AttrDouble(1.0 + r / 8.0),
        "schema" -> W.AttrStr("NXsns"),
        "station" -> W.AttrStr(s"ST${r % 2}"),
        "archived" -> W.AttrLong(0L)),
      denseAttrs = true,
      // the entry group's ~15+ links overflow one 256-byte heap block,
      // so the oracle corpus also exercises the root-INDIRECT fractal
      // heap generation (FHIB + multiple direct blocks)
      dense = true)

    W.write(Seq(entry), rootAttrs = Seq(
      "file_name" -> W.AttrStr(s"run_${1000 + r}.nxs.h5"),
      "HDF5_Version" -> W.AttrStr("1.10.5")))
  }

  /** Write `nRuns` fixture files into `dir` (idempotent: existing
    * complete dirs are reused — the bytes are deterministic). Returns the
    * directory path. */
  def writeRunDir(dir: java.nio.file.Path, nRuns: Int,
                  pulseScale: Int = 1): java.nio.file.Path =
    synchronized {
      java.nio.file.Files.createDirectories(dir)
      (0 until nRuns).foreach { r =>
        val f = dir.resolve(s"run_${1000 + r}.nxs.h5")
        val bytes = runFileBytes(r, pulseScale)
        if (!java.nio.file.Files.exists(f) ||
            java.nio.file.Files.size(f) != bytes.length)
          java.nio.file.Files.write(f, bytes)
      }
      dir
    }

  /** Shared 6-run corpus for the `nexus_h5_*` oracle queries. */
  def oracleCorpus(): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_nexus_oracle_r13b")
    writeRunDir(dir, 6).toString
  }
}
