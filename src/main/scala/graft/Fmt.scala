package graft

/** Locale-pinned number formatting for machine-parsed JSON artifacts
  * (checkpoint sidecars, the Pipeline/Verify/Bench summary lines).
  * Scala's `f"$x%.2f"` interpolator formats with the JVM DEFAULT locale —
  * on a comma-decimal cluster locale (fr/de/...) it emits `0,50`, which is
  * invalid JSON and silently mis-parses under the sidecar regexes
  * (`"sec":(-?[0-9.]+)` would match only the integer part).
  */
object Fmt {
  def num(d: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))
}
