package graft.tools

/** Prints the [[graft.Verify]] build fingerprint without running the dump —
  * the one-command way to compare two checkouts'/builds' engine binaries
  * (equal fingerprints ⇒ identical graft class files; see the Verify
  * scaladoc for the q_adamic_adar r12 skew incident this exists for).
  *
  * Usage: `runMain graft.tools.FingerprintProbe`
  */
object FingerprintProbe {
  def main(args: Array[String]): Unit = {
    val (fp, n, newest, root) = graft.Verify.buildFingerprint()
    println(s"classes_sha256=$fp")
    println(s"n_class_files=$n")
    println(s"newest_class_mtime=$newest")
    println(s"classpath_root=$root")
  }
}
