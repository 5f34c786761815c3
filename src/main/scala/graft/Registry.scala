package graft

/** Single source of truth for every operator/query the engine exposes
  * through the driver contract. Each group object contributes a
  * Vector[QuerySpec]; SparkEntry/Verify/Bench all derive from here.
  */
object Registry {

  def specs: Vector[QuerySpec] =
    queries.Relational.specs ++
      queries.Relational2.specs ++
      queries.Relational3.specs ++
      queries.Relational4.specs ++
      queries.TpchMore.specs ++
      queries.Partsupp.specs ++
      queries.TypedOps.specs ++
      queries.Collections.specs ++
      queries.Stats.specs ++
      queries.Corpus.specs ++
      queries.TextOps.specs ++
      queries.Dedup.specs ++
      queries.EventsOps.specs ++
      queries.Similarity.specs ++
      queries.MultimodalOps.specs ++
      queries.Pipeline.specs

  def byName: Map[String, QuerySpec] = specs.map(s => s.name -> s).toMap

  def headline: Vector[QuerySpec] = specs.filter(_.headline)
}
