package graft.tools

/** Shared naming for the offline-index tools' catalog entries. One
  * recipe, one place: a sanitized path slug plus a path-hash suffix, so
  * two artifacts in one session/metastore register as DISTINCT tables
  * (the `DROP TABLE IF EXISTS`-clobbers-the-other failure both IvfBuild
  * and CorpusBuild would otherwise share) and a future change to the
  * sanitization cannot silently diverge between the tools.
  */
private[tools] object Catalog {
  def pathTable(prefix: String, outDir: String): String = {
    val slug = outDir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(40).toLowerCase
    f"${prefix}_${slug}_${outDir.hashCode & 0x7fffffff}%x"
  }
}
