package graft.logql

import scala.collection.concurrent.TrieMap

/** LogQL macro plugin hook (`logql_parser/model.go:485-496` MacrosOp;
  * `clickhouse_planner/planner.go:548-552` rejects any macro the plugin
  * layer has not registered with "not implemented"). A macro is a
  * `_name("p1", ...)` atom; a registered expander maps its string params
  * to LogQL source, which is parsed in place of the call. Unregistered
  * macros fail loudly at parse time — never silently dropped.
  */
object LogQLMacros {

  private val registry = TrieMap[String, Seq[String] => String]()

  /** Register (or replace) a macro expander. */
  def register(name: String, expand: Seq[String] => String): Unit = {
    require(name.matches("_[a-zA-Z0-9_]+"),
      s"macro name must match _[a-zA-Z0-9_]+: $name")
    registry.put(name, expand): Unit
  }

  def unregister(name: String): Unit = registry.remove(name): Unit

  /** Expansion source for a call, if registered. */
  def expansion(name: String, params: Seq[String]): Option[String] =
    registry.get(name).map(_(params))
}
