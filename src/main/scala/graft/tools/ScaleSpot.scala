package graft.tools

/** ×1000 spot-check (SCALE.md §5 tail): one order of magnitude past the
  * full study grid, on the heaviest always-on family — embedding
  * near-dup dedup (the q54 shape at the dedup threshold). 2M seeded
  * vectors in-memory (generation off the measured path), the
  * occupancy-adaptive width (14 bits at 2M), the same exact
  * twin-recall audit as the ×100 tier run. One number that says the
  * ×10/×100 trend keeps holding when the corpus grows again by 10×.
  *
  * The occupancy target is a knob here (default 16 at this tier, vs
  * the library default 128): candidate volume is bands·N·occupancy/2 —
  * LINEAR in N, which is the point, but 128-occupancy at 2M vectors is
  * ~480M materialized candidates (~50 GB through the sorter), an
  * aggregate-disk budget a cluster has and one box does not (the first
  * ×1000 attempt filled the box's /tmp). Lowering the target trades a
  * measurable sliver of recall (cos 0.998 twins at 17 bits: per-band
  * p ≈ 0.986¹⁷ ≈ 0.79, 4 bands → 99.8%) for 8× less candidate IO —
  * the same dial a production dedup run sets per cluster.
  *
  * Usage: ScaleSpot [srcDir] [mult] [targetOccupancy]
  */
object ScaleSpot {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 1000
    val occ = if (args.length > 2) args(2).toLong else 16L
    val spark = ToolSession.local()
    val (nVecs, nPairs, nClustered, wall, twinsFound, twinsTotal) =
      ScaleTiers.embDedupStudy(spark, src, mult, targetOccupancy = occ)
    val line =
      f"""{"metric":"scalespot","mult":$mult,"occupancy":$occ,"vecs":$nVecs,""" +
      f""""pairs":$nPairs,"clustered":$nClustered,"wall_s":$wall%.1f,""" +
      f""""twin_found":$twinsFound,"twin_total":$twinsTotal}"""
    try spark.stop() finally println(line)
  }
}
