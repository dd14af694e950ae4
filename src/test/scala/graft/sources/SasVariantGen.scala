package graft.sources

/** Dev tool: writes the SAS7BDAT layout-variant fixtures (32-bit, mix first
  * page) that `scripts/check_sas7bdat.py` cross-validates with
  * pandas.read_sas — the independent-implementation conformance check.
  *
  * Run: sbt "Test/runMain graft.sources.SasVariantGen /tmp/sasvar"
  * then: python3 scripts/check_sas7bdat.py --variants /tmp/sasvar
  */
object SasVariantGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sasvar")
    new java.io.File(out).mkdirs()
    val cols = Seq(Sas7bdatWriter.WCol("a", isNum = true, 8), Sas7bdatWriter.WCol("b", isNum = false, 6))
    val rows = (0 until 450).map(i => Seq(java.lang.Double.valueOf(i * 0.5), s"s$i"): Seq[Any])
    Sas7bdatWriter.write(s"$out/v32.sas7bdat", cols, rows, 4096, u64 = false)
    Sas7bdatWriter.write(s"$out/vmix.sas7bdat", cols, rows, 4096, u64 = true, mixFirstPage = true)
    Sas7bdatWriter.write(s"$out/v32mix.sas7bdat", cols, rows, 4096, u64 = false, mixFirstPage = true)
    Sas7bdatWriter.write(s"$out/vrle.sas7bdat", cols, rows, 4096, u64 = true, compressRle = true)
    Sas7bdatWriter.write(s"$out/v32rle.sas7bdat", cols, rows, 4096, u64 = false, compressRle = true)
    println(s"wrote 5 variant files to $out")
  }
}
