package graft.queries

import graft.QueryDef

/** Single assembly point for every query module's catalog. */
object Registry {
  def all: Seq[QueryDef] =
    MapReduceQueries.all ++ Relational.all ++ Relational2.all ++
      Relational3.all ++ Relational4.all ++ Relational5.all ++
      Relational6.all ++ Relational7.all ++
      graft.operators.TextAnalysis.all ++ graft.operators.TextPipeline.all ++
      graft.operators.TextScoring.all ++ graft.operators.HeavyHitters.all ++
      graft.operators.Bpe.all ++ graft.operators.Unigram.all ++
      graft.operators.Curation.all ++
      graft.operators.Pipeline2.all ++ graft.operators.PipelineE2E.all ++
      graft.operators.Packing.all ++
      graft.operators.Dedup.all ++ graft.operators.Components.all ++
      graft.operators.Similarity.all ++ graft.operators.Clustering.all ++
      graft.operators.Semantic.all ++ graft.operators.Retrieval.all ++
      graft.operators.Spectral.all ++ graft.operators.Eval.all ++
      graft.operators.Events.all ++ graft.operators.Journeys.all ++
      graft.operators.SessionFunnel.all ++
      graft.operators.PageRank.all ++ graft.operators.LabelProp.all ++
      graft.operators.Mis.all ++
      graft.operators.Triangles.all ++ graft.operators.Basket.all ++
      graft.operators.KCore.all ++ graft.operators.Hierarchy.all ++
      graft.operators.Mixture.all ++ graft.operators.Profiling.all ++
      graft.operators.UrlCuration.all ++ graft.operators.HtmlExtract.all ++
      graft.operators.Winnowing.all ++ graft.operators.Bootstrap.all ++
      graft.operators.Anonymity.all ++ graft.operators.Coreset.all ++
      graft.operators.Chunking.all ++ graft.operators.Cdc.all ++
      graft.operators.Multimodal.all ++ graft.operators.AsOfJoin.all ++
      StreamingQueries.all ++
      Statistics.all ++ graft.operators.Association.all ++
      graft.sources.Sinks.all
}
