package graft.queries

import graft.GraftQuery

/** The assembled SURVEY.md §2 inventory. */
object Registry {
  def all: Seq[GraftQuery] =
    Analytics.all ++ ChFunctions.all ++ Replication.all ++ DataPipeline.all ++
      EventsAnalytics.all ++ Arrays.all
}
