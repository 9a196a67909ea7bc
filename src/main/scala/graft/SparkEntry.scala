package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every key in `queries` has a DuckDB-runnable ANSI-SQL twin in
  * `oracleSql` built from the same arithmetic snippets (TpchGeo), so the
  * driver's hash compare sees bit-identical values and column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the distributed kNN join (grid + two-pass candidate probing).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.knnJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cell_stats" -> (Queries.cellStats(_, _)),
    "q_range_contained" -> (Queries.rangeContained(_, _)),
    "q_range_intersecting" -> (Queries.rangeIntersecting(_, _)),
    "q_locate_all_at_point" -> (Queries.locateAllAtPoint(_, _)),
    "q_within_distance" -> (Queries.withinDistance(_, _)),
    "q_knn_join" -> (Queries.knnJoin(_, _)),
    "q_knn_trees" -> (Queries.knnJoinTrees(_, _)),
    "q_knn_nd" -> (Queries.knnNd(_, _)),
    "q_nn_ties" -> (Queries.nnTies(_, _)),
    "q_intersection_join" -> (Queries.intersectionJoin(_, _)),
    "q_distance_ordered" -> (Queries.distanceOrdered(_, _)),
    "q_contains" -> (Queries.containsQuery(_, _)),
    "q_remove_one" -> (Queries.removeOne(_, _)),
    "q_drain_remainder" -> (Queries.drainRemainder(_, _)),
    "q_envelope_agg" -> (Queries.envelopeAgg(_, _)),
    "q_line_nearest" -> (Queries.lineNearest(_, _)),
    "q_line_grid_nn" -> (Queries.lineGridNN(_, _)),
    "q_persisted_range" -> (Queries.persistedRange(_, _)),
    "q_persisted_knn" -> (Queries.persistedKnn(_, _)),
    "q_insert_append" -> (Queries.insertAppend(_, _)),
    "q_persisted_append" -> (Queries.persistedAppend(_, _)),
    // training-data pipeline operators
    "q_dedup_exact" -> (PipelineQueries.dedupExact(_, _)),
    "q_embed_dup" -> (PipelineQueries.embedDup(_, _)),
    "q_ngram_dup" -> (PipelineQueries.ngramDup(_, _)),
    "q_minhash_dup" -> (PipelineQueries.minhashDup(_, _)),
    "q_dup_clusters" -> (PipelineQueries.dupClusters(_, _)),
    "q_clean_corpus" -> (PipelineQueries.cleanCorpus(_, _)),
    "q_simhash" -> (PipelineQueries.simhash(_, _)),
    "q_fingerprints" -> (PipelineQueries.fingerprints(_, _)),
    "q_token_stats" -> (PipelineQueries.tokenStats(_, _)),
    "q_token_bpe" -> (PipelineQueries.tokenBpe(_, _)),
    "q_token_bpe2" -> (PipelineQueries.tokenBpe2(_, _)),
    "q_decontaminate" -> (PipelineQueries.decontaminate(_, _)),
    "q_media_phash" -> (PipelineQueries.mediaPhash(_, _)),
    "q_text_quality" -> (PipelineQueries.textQuality(_, _)),
    "q_rep_stats" -> (PipelineQueries.repStats(_, _)),
    "q_asof_join" -> (PipelineQueries.asofJoin(_, _)),
    "q_sessionize" -> (PipelineQueries.sessionize(_, _)),
    "q_interval_join" -> (PipelineQueries.intervalJoin(_, _)),
    "q_quantiles" -> (PipelineQueries.quantiles(_, _)),
    "q_json_props" -> (PipelineQueries.jsonProps(_, _)),
    "q_pii_scrub" -> (PipelineQueries.piiScrub(_, _)),
    "q_hash_sample" -> (PipelineQueries.hashSample(_, _)),
    "q_rarity_score" -> (PipelineQueries.rarityScore(_, _)),
    "q_zorder_layout" -> (Queries.zorderLayout(_, _)),
    "q_lang_id" -> (PipelineQueries.langId(_, _)),
    "q_entity_cells" -> (PipelineQueries.entityCells(_, _)),
    "q_ann_topk" -> (PipelineQueries.annTopK(_, _)),
    "q_ann_ivf" -> (PipelineQueries.annIvf(_, _)),
    "q_ann_lsh_topk" -> (PipelineQueries.annLshTopK(_, _)),
    "q_ann_cosine" -> (PipelineQueries.annCosine(_, _)),
    "q_ann_lsh" -> (PipelineQueries.annLsh(_, _)),
    "q_events_window" -> (PipelineQueries.eventsWindow(_, _)),
    "q_pip_join" -> (Queries.pipJoinQ(_, _)),
    "q_pip_poly" -> (Queries.pipPolyQ(_, _)),
    "q_rasterize" -> (Queries.rasterizeQ(_, _)),
    "q_zonal_stats" -> (Queries.zonalStatsQ(_, _)),
    "q_knn_rects" -> (Queries.knnRects(_, _)),
    "q_line_knn" -> (Queries.lineKnn(_, _)),
    "q_media_meta" -> (PipelineQueries.mediaMeta(_, _)),
    "q_media_decode" -> (PipelineQueries.mediaDecode(_, _)),
    "q_media_audio" -> (PipelineQueries.mediaAudio(_, _)),
    "q_media_video" -> (PipelineQueries.mediaVideo(_, _)),
    "q_media_formats" -> (PipelineQueries.mediaFormats(_, _)),
    "q_media_resize" -> (PipelineQueries.mediaResize(_, _)),
    "q_stream_dedup" -> (PipelineQueries.streamDedup(_, _)),
    "q_stream_tile" -> (PipelineQueries.streamTileJoin(_, _)),
    "q_stream_window" -> (PipelineQueries.streamWindow(_, _)),
    "q_stream_index" -> (PipelineQueries.streamIndex(_, _)),
    "q_stream_sessionize" -> (PipelineQueries.streamSessionize(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_cell_stats" -> Queries.cellStatsSql,
    "q_range_contained" -> Queries.rangeContainedSql,
    "q_range_intersecting" -> Queries.rangeIntersectingSql,
    "q_locate_all_at_point" -> Queries.locateAllAtPointSql,
    "q_within_distance" -> Queries.withinDistanceSql,
    "q_knn_join" -> Queries.knnJoinSql,
    "q_knn_trees" -> Queries.knnJoinSql, // same exact semantics, fused path
    "q_knn_nd" -> Queries.knnNdSql,
    "q_nn_ties" -> Queries.nnTiesSql,
    "q_intersection_join" -> Queries.intersectionJoinSql,
    "q_distance_ordered" -> Queries.distanceOrderedSql,
    "q_contains" -> Queries.containsQuerySql,
    "q_remove_one" -> Queries.removeOneSql,
    "q_drain_remainder" -> Queries.drainRemainderSql,
    "q_envelope_agg" -> Queries.envelopeAggSql,
    "q_line_nearest" -> Queries.lineNearestSql,
    "q_line_grid_nn" -> Queries.lineGridNNSql,
    "q_persisted_range" -> Queries.persistedRangeSql,
    "q_persisted_knn" -> Queries.knnJoinSql, // bit-equal to the in-memory kNN
    "q_insert_append" -> Queries.insertAppendSql,
    "q_persisted_append" -> Queries.persistedAppendSql,
    // pipeline oracles — every query carries one: the hash-based scale
    // paths run on OracleHash arithmetic with generated SQL twins
    "q_dedup_exact" -> PipelineQueries.dedupExactSql,
    "q_embed_dup" -> PipelineQueries.embedDupSql,
    "q_ngram_dup" -> PipelineQueries.ngramDupSql,
    "q_minhash_dup" -> PipelineQueries.minhashDupSql,
    "q_dup_clusters" -> PipelineQueries.dupClustersSql,
    "q_simhash" -> PipelineQueries.simhashSql,
    "q_clean_corpus" -> PipelineQueries.cleanCorpusSql,
    "q_lang_id" -> PipelineQueries.langIdSql,
    "q_entity_cells" -> PipelineQueries.entityCellsSql,
    "q_fingerprints" -> PipelineQueries.fingerprintsSql,
    "q_token_stats" -> PipelineQueries.tokenStatsSql,
    "q_token_bpe" -> PipelineQueries.tokenBpeSql,
    "q_token_bpe2" -> PipelineQueries.tokenBpe2Sql,
    "q_decontaminate" -> PipelineQueries.decontaminateSql,
    "q_media_phash" -> PipelineQueries.mediaPhashSql,
    "q_text_quality" -> PipelineQueries.textQualitySql,
    "q_rep_stats" -> PipelineQueries.repStatsSql,
    "q_asof_join" -> PipelineQueries.asofJoinSql,
    "q_sessionize" -> PipelineQueries.sessionizeSql,
    "q_interval_join" -> PipelineQueries.intervalJoinSql,
    "q_quantiles" -> PipelineQueries.quantilesSql,
    "q_json_props" -> PipelineQueries.jsonPropsSql,
    "q_pii_scrub" -> PipelineQueries.piiScrubSql,
    "q_hash_sample" -> PipelineQueries.hashSampleSql,
    "q_rarity_score" -> PipelineQueries.rarityScoreSql,
    "q_zorder_layout" -> Queries.zorderLayoutSql,
    "q_ann_topk" -> PipelineQueries.annTopKSql,
    "q_ann_ivf" -> PipelineQueries.annTopKSql, // exact: same answer as brute force
    "q_ann_lsh_topk" -> PipelineQueries.annLshTopKSql,
    "q_ann_cosine" -> PipelineQueries.annCosineSql,
    "q_ann_lsh" -> PipelineQueries.annLshSql,
    "q_events_window" -> PipelineQueries.eventsWindowSql,
    "q_pip_join" -> Queries.pipJoinSql,
    "q_pip_poly" -> Queries.pipPolySql,
    "q_rasterize" -> Queries.rasterizeSql,
    "q_zonal_stats" -> Queries.zonalStatsSql,
    "q_knn_rects" -> Queries.knnRectsSql,
    "q_line_knn" -> Queries.lineKnnSql,
    "q_media_meta" -> PipelineQueries.mediaMetaSql,
    "q_media_decode" -> PipelineQueries.mediaDecodeSql,
    "q_media_audio" -> PipelineQueries.mediaAudioSql,
    "q_media_video" -> PipelineQueries.mediaVideoSql,
    "q_media_formats" -> PipelineQueries.mediaFormatsSql,
    "q_media_resize" -> PipelineQueries.mediaResizeSql,
    "q_stream_dedup" -> PipelineQueries.streamDedupSql,
    "q_stream_tile" -> PipelineQueries.streamTileJoinSql,
    "q_stream_window" -> PipelineQueries.streamWindowSql,
    "q_stream_index" -> PipelineQueries.streamIndexSql,
    "q_stream_sessionize" -> PipelineQueries.streamSessionizeSql
  )
}
