package graft.queries

/** The full query-registry assembly: every family trait mixed together.
  * Family traits self-type to this, so any member may reference any other
  * regardless of which file it lives in.
  */
trait RegistryAll
  extends CoreHelpers
  with ParityQueries
  with RelationalQueries
  with TextQueries
  with DedupQueries
  with SimilarityQueries
  with GraphQueries
  with RetrievalQueries
  with EvalQueries
  with SamplingQueries
  with DriftQueries
  with TimeseriesQueries
  with PrivacyQueries
  with ReportQueries
