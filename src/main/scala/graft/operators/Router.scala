package graft.operators

import graft.config.SyncConfig
import org.apache.spark.sql.DataFrame

/** Table-route predicate: events for tables without a rule are silently
  * dropped (reference: river/sync.go:73-76), matched tables flow through
  * their rule's projection. Wildcard source specs are expanded against the
  * catalog before this point (reference: river/river.go:196-221 —
  * [[graft.config.Rule.expand]]).
  */
object Router {
  def route(tables: Map[(String, String), DataFrame],
      cfg: SyncConfig): Map[(String, String), DataFrame] =
    tables.flatMap { case ((schema, table), df) =>
      cfg.ruleFor(schema, table).map { r =>
        (schema, table) -> Projection(r)(df)
      }
    }
}
