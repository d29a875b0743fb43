package graft.queries

import graft.QueryDef

/** Single assembly point for every query module's catalog. */
object Registry {
  def all: Seq[QueryDef] =
    MapReduceQueries.all ++ Relational.all
}
