package graft.operators

/** Test-only crash injection: a named point throws iff the
  * `graft.test.failpoint` system property equals its name. Production runs
  * never set the property, so a failpoint costs one system-property probe —
  * effectively free next to the Spark jobs it sits between. The crash-safety
  * specs (torn canonical-map folds, ingest-epoch replay) use these to cut an
  * operator at each documented crash window and prove the recovery path
  * restores the exact persisted state.
  */
private[graft] object FailPoint {
  val Prop = "graft.test.failpoint"
  def apply(name: String): Unit =
    if (sys.props.get(Prop).contains(name))
      throw new IllegalStateException(s"failpoint: $name")
}
