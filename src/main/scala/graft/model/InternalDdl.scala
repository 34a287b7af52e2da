package graft.model

/** Thread-local marker distinguishing the ENGINE'S OWN catalog DDL from a
  * user's. The versioned commit protocol legitimately issues `ALTER TABLE
  * … SET LOCATION`, partition drops, `MSCK REPAIR`, and `DROP/CREATE
  * TABLE` against graft tables — those are the commit's metadata
  * repoints, serialized under the table lock. The SAME verbs typed by a
  * user would mutate the catalog/layout BEHIND the manifest (a location
  * repoint tears the committed-file-set contract; a partition drop
  * resurrects or hides rows), so [[graft.plans.GraftSqlParser]] refuses
  * them on graft tables — unless this marker says the call comes from
  * inside a commit. Thread-local because the engine's DDL always runs on
  * the committing thread under the table lock.
  */
object InternalDdl {

  private val active = ThreadLocal.withInitial[java.lang.Boolean](() => false)

  def isActive: Boolean = active.get()

  def run[T](body: => T): T = {
    val prev = active.get()
    active.set(true)
    try body finally active.set(prev)
  }
}
